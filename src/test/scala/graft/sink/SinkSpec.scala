package graft.sink

import graft.SparkSpec
import SinkMapper.ColumnMapping

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("error classification: retryable vs permanent vs unknown") {
    import ErrorClassifier._
    assert(classify(159) == Retryable) // timeout
    assert(classify(241) == Retryable) // memory limit
    assert(classify(242) == Retryable) // readonly table
    assert(classify(202) == Retryable) // too many queries
    assert(classify(6) == Permanent)   // parse
    assert(classify(16) == Permanent)  // no such column
    assert(classify(53) == Permanent)  // type mismatch
    assert(classify(349) == Permanent) // null in not-null
    assert(classify(777777) == Unknown)

    assert(classify(new RuntimeException("Code: 241. DB::Exception: Memory limit")) == Retryable)
    assert(classify(new RuntimeException("Code: 53. DB::Exception: Type mismatch")) == Permanent)
    assert(classify(new RuntimeException("connection refused")) == Retryable)
    assert(classify(new RuntimeException("something odd")) == Unknown)
  }

  test("insert sql uses mapping-declared column order") {
    val c = ClickHouseSink.Config(
      url = "jdbc:ch://h:8123", database = "db", table = "t",
      mappings = Seq(
        ColumnMapping("a", "col_a", "String"),
        ColumnMapping("b", "col_b", "Int64")))
    assert(ClickHouseSink.insertSql(c) == "INSERT INTO db.t (col_a, col_b)")
  }

  test("dlq envelope wraps original rows as JSON") {
    val df = Seq(("x", 5L)).toDF("id", "n")
    val out = Dlq.envelope("sink", "Code: 53")(df).collect().head
    assert(out.getAs[String]("component") == "sink")
    assert(out.getAs[String]("error") == "Code: 53")
    assert(out.getAs[String]("original_message") == """{"id":"x","n":5}""")
  }
}
