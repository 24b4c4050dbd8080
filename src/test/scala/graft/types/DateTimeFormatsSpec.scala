package graft.types

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

class DateTimeFormatsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(s: String): Any =
    Seq(s).toDF("c").select(DateTimeFormats.parseString(col("c")).as("o")).head.get(0)

  private val expect = java.sql.Timestamp.valueOf("2025-01-01 10:00:00")

  test("accepted string formats all land on the same instant") {
    val forms = Seq(
      "2025-01-01T10:00:00Z",
      "2025-01-01T10:00:00+00:00",
      "2025-01-01T11:00:00+01:00",
      "2025-01-01T10:00:00.000Z",
      "2025-01-01T10:00:00.000000Z",
      "2025-01-01T10:00:00",
      "2025-01-01 10:00:00",
      "2025-01-01 10:00:00.000",
      "2025-01-01 10:00:00+00:00",
      "2025/01/01 10:00:00",
      "01/01/2025 10:00:00",
      "01-01-2025 10:00:00")
    forms.foreach(f => assert(parse(f) == expect, s"format failed: $f"))
  }

  test("date-only and compact forms parse to midnight") {
    val mid = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    Seq("2025-01-01", "2025/01/01", "20250101").foreach(f =>
      assert(parse(f) == mid, s"format failed: $f"))
  }

  test("unix seconds and milliseconds digit strings") {
    assert(parse("1735725600") == expect)
    assert(parse("1735725600000") == expect)
  }

  test("garbage yields null, never throws") {
    Seq("not-a-date", "", "12345", "2025-13-45T99:99:99Z").foreach(f =>
      assert(parse(f) == null, s"should be null: $f"))
  }

  test("parseAny: int seconds, float seconds, timestamps pass through") {
    def any(v: Any, dt: DataType): Any = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(v)),
        StructType(Seq(StructField("c", dt))))
      df.select(DateTimeFormats.parseAny(col("c"), dt).as("o")).head.get(0)
    }
    assert(any(1735725600L, LongType) == expect)
    assert(any(1735725600.5, DoubleType) ==
      java.sql.Timestamp.valueOf("2025-01-01 10:00:00.5"))
    assert(any(expect, TimestampType) == expect)
  }
}
