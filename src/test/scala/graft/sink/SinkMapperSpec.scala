package graft.sink

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import SinkMapper.ColumnMapping

class SinkMapperSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", StringType),
    StructField("user.id", StringType),     // literal dotted name
    StructField("user", StructType(Seq(StructField("name", StringType)))),
    StructField("n", LongType),
    StructField("created_at", StringType)))

  private def df(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private val mappings = Seq(
    ColumnMapping("event_id", "event_id", "UUID"),
    ColumnMapping("user.id", "user_id", "String"),      // resolves literal-first
    ColumnMapping("user.name", "name", "String"),       // resolves nested
    ColumnMapping("n", "small", "Int16"),
    ColumnMapping("created_at", "created_at", "DateTime"))

  private val good = Row("9baea34c-08b2-4ea7-9a32-1575e2048cdb", "u-1", Row("Ada"),
    42L, "2025-01-01T10:00:00Z")

  test("absent source fields insert NULL; Map targets insert empty map; Nullable is sink-transparent") {
    // mirrors reference sink.feature "Import events with Nullable string"
    // (mapping for a field no schema version carries) + mapper.go:100-118
    val m = Seq(
      ColumnMapping("event_id", "event_id", "String"),
      ColumnMapping("ghost", "ghost", "Nullable(String)"),
      ColumnMapping("ghost_n", "ghost_n", "Int32"),
      ColumnMapping("ghost_m", "ghost_m", "Map(String, String)"))
    val out = SinkMapper(m)(df(Row("e1", "u1", Row("ann"), 5L, "t")))
    val r = out.head
    assert(out.columns.toSeq == Seq("event_id", "ghost", "ghost_n", "ghost_m"))
    assert(r.getString(0) == "e1" && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getMap[String, String](3).isEmpty)
    // absent fields are never DLQ'd
    val (good, bad) = SinkMapper.partitionErrors(m)(df(Row("e1", "u1", Row("ann"), 5L, "t")))
    assert(good.count() == 1 && bad.count() == 0)
    // control plane stays strict: Nullable rejected, absent field rejected
    assert(graft.types.CHType.isSupported("String"))
    assert(!graft.types.CHType.isSupported("Nullable(String)"))
    assert(SinkMapper.validate(m, schema).isLeft)
  }

  test("maps a valid row to the target shape") {
    val out = SinkMapper(mappings)(df(good)).head
    assert(out.getString(0) == "9baea34c-08b2-4ea7-9a32-1575e2048cdb")
    assert(out.getString(1) == "u-1")
    assert(out.getString(2) == "Ada")
    assert(out.getShort(3) == 42)
    assert(out.getTimestamp(4) == java.sql.Timestamp.valueOf("2025-01-01 10:00:00"))
  }

  test("partitionErrors routes conversion failures to the DLQ frame") {
    val overflow = Row("9baea34c-08b2-4ea7-9a32-1575e2048cdb", "u-2", Row("Bob"),
      99999L, "2025-01-01T10:00:00Z")          // 99999 > Int16 max
    val badTs = Row("9baea34c-08b2-4ea7-9a32-1575e2048cdb", "u-3", Row("Eve"),
      1L, "not a timestamp")
    val (ok, dlq) = SinkMapper.partitionErrors(mappings)(df(good, overflow, badTs))
    assert(ok.count() == 1)
    assert(dlq.count() == 2)
    assert(dlq.columns.toSeq == schema.fieldNames.toSeq) // DLQ keeps source shape
  }

  test("null source values pass through (ClickHouse validates)") {
    val withNull = Row(null, "u-4", Row("Zed"), 1L, "2025-01-01T10:00:00Z")
    val (ok, dlq) = SinkMapper.partitionErrors(mappings)(df(withNull))
    assert(ok.count() == 1 && dlq.count() == 0)
    assert(ok.head.isNullAt(0))
  }

  test("validate reports bad types and unknown fields") {
    assert(SinkMapper.validate(mappings, schema).isRight)
    // Decimal and Tuple are IN the sink domain (beyond-reference
    // extensions); unknown / malformed types stay out
    assert(SinkMapper.validate(
      Seq(ColumnMapping("event_id", "c", "Decimal(10,2)")), schema).isRight)
    assert(SinkMapper.validate(
      Seq(ColumnMapping("event_id", "c", "Tuple(String, Int32)")), schema).isRight)
    assert(SinkMapper.validate(
      Seq(ColumnMapping("event_id", "c", "Interval")), schema).isLeft)
    assert(SinkMapper.validate(
      Seq(ColumnMapping("event_id", "c", "Tuple(a String, Int32)")), schema).isLeft)
    assert(SinkMapper.validate(
      Seq(ColumnMapping("missing_field", "c", "String")), schema).isLeft)
  }
}
