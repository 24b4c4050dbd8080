package graft.types

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import CHType._

class CHTypeSpec extends SparkSpec {
  import spark.implicits._

  // ---- parser ----
  test("parses scalar types") {
    assert(CHType.parse("String") == CHString)
    assert(CHType.parse("FixedString(16)") == CHFixedString(16))
    assert(CHType.parse("Bool") == CHBool)
    assert(CHType.parse("Int32") == CHInt(32))
    assert(CHType.parse("UInt64") == CHUInt(64))
    assert(CHType.parse("Float64") == CHFloat64)
    assert(CHType.parse("UUID") == CHUUID)
    assert(CHType.parse("DateTime") == CHDateTime(None))
    assert(CHType.parse("DateTime64(3)") == CHDateTime64(3, None))
    assert(CHType.parse("DateTime64(3, 'UTC')") == CHDateTime64(3, Some("UTC")))
  }

  test("parses nested / wrapped types") {
    assert(CHType.parse("LowCardinality(String)") == CHLowCardinality(CHString))
    assert(CHType.parse("LowCardinality(FixedString(8))") == CHLowCardinality(CHFixedString(8)))
    assert(CHType.parse("Map(String, String)") == CHMap(CHString, CHString))
    assert(CHType.parse("Array(Int64)") == CHArray(CHInt(64)))
    assert(CHType.parse("Array(Map(String, String))") == CHArray(CHMap(CHString, CHString)))
    assert(CHType.parse("Enum8('a' = 1, 'b' = 2)") == CHEnum(8, Map("a" -> 1, "b" -> 2)))
  }

  test("rejects unsupported types (reference parity)") {
    Seq("Nullable(String)", "Tuple(Nullable(String), Int32)", "Interval")
      .foreach(t => assert(!CHType.isSupported(t), s"$t should be unsupported"))
  }

  test("parses Tuple / Nested / IPv4 / IPv6 (beyond-reference sink types)") {
    assert(CHType.parse("Tuple(String, Int32)") ==
      CHTuple(Seq(None -> CHString, None -> CHInt(32))))
    assert(CHType.parse("Tuple(a String, n UInt32)") ==
      CHTuple(Seq(Some("a") -> CHString, Some("n") -> CHUInt(32))))
    // a backquoted name and a type-name-looking name both parse as names
    assert(CHType.parse("Tuple(`odd name` String, String String)") ==
      CHTuple(Seq(Some("odd name") -> CHString, Some("String") -> CHString)))
    // Nested(a T, b U) IS Array(Tuple(...)) (flatten_nested=0 shape)
    assert(CHType.parse("Nested(id UInt32, tag String)") ==
      CHArray(CHTuple(Seq(Some("id") -> CHUInt(32), Some("tag") -> CHString))))
    assert(CHType.parse("IPv4") == CHIPv4)
    assert(CHType.parse("IPv6") == CHIPv6)
    // deep nesting round-trips through render
    Seq("Tuple(a String, n UInt32)", "Tuple(String, Int32)",
      "Array(Tuple(id UInt32, tag String))", "Map(String, String)",
      "Tuple(a Tuple(b Array(IPv4), c DateTime64(3, 'UTC')))").foreach { t =>
      assert(CHType.render(CHType.parse(t)) == t, s"render∘parse != id for $t")
    }
    // mixed named/unnamed is a parse error (as in the server)
    intercept[CHType.ParseException](CHType.parse("Tuple(a String, Int32)"))
    // Nested elements must be named
    intercept[CHType.ParseException](CHType.parse("Nested(String)"))
    // real-server type-construction rules: a type a real CREATE TABLE
    // would reject must not validate here either
    // 1. Nullable cannot wrap LowCardinality/composites (error 43);
    //    LowCardinality(Nullable(T)) is the legal nesting order
    intercept[CHType.ParseException](CHType.parse("Nullable(LowCardinality(String))"))
    intercept[CHType.ParseException](CHType.parse("Nullable(Array(String))"))
    intercept[CHType.ParseException](CHType.parse("Nullable(Map(String, String))"))
    assert(CHType.parse("LowCardinality(Nullable(String))") ==
      CHLowCardinality(CHNullable(CHString)))
    // 2. LowCardinality of numerics/dates is "suspicious" and prohibited
    //    by default (error 455); string shapes stay legal
    intercept[CHType.ParseException](CHType.parse("LowCardinality(UInt8)"))
    intercept[CHType.ParseException](CHType.parse("LowCardinality(Float64)"))
    intercept[CHType.ParseException](CHType.parse("LowCardinality(DateTime)"))
    assert(CHType.parse("LowCardinality(FixedString(4))") ==
      CHLowCardinality(CHFixedString(4)))
    // 3. Map keys must be hashable scalars — Nullable/Float/composite
    //    keys are rejected at CREATE
    intercept[CHType.ParseException](CHType.parse("Map(Nullable(String), String)"))
    intercept[CHType.ParseException](CHType.parse("Map(Float64, String)"))
    intercept[CHType.ParseException](CHType.parse("Map(Array(String), String)"))
    assert(CHType.parse("Map(UInt32, String)") == CHMap(CHUInt(32), CHString))
    // spark shapes
    assert(CHType.parse("Tuple(a String, n Int32)").sparkType ==
      StructType(Seq(StructField("a", StringType), StructField("n", IntegerType))))
    assert(CHType.parse("Tuple(String, Int32)").sparkType ==
      StructType(Seq(StructField("_1", StringType), StructField("_2", IntegerType))))
    assert(CHType.parse("IPv4").sparkType == StringType)
  }

  test("tuple and IP conversions (cast matrix)") {
    val tupIn = StructType(Seq(StructField("x", StringType), StructField("y", LongType)))
    val out = conv(org.apache.spark.sql.Row("hi", 7L), tupIn, "Tuple(a String, n Int32)")
    assert(out.asInstanceOf[org.apache.spark.sql.Row].toSeq == Seq("hi", 7))
    assert(conv("1.2.3.4", StringType, "IPv4") == "1.2.3.4")
    assert(conv("999.2.3.4", StringType, "IPv4") == null) // octet out of range
    assert(conv(16909060L, LongType, "IPv4") == "1.2.3.4") // raw UInt32 form
    assert(conv("2001:db8::1", StringType, "IPv6") == "2001:db8::1")
    assert(conv("no-colons-here", StringType, "IPv6") == null)
  }

  test("enum labels: escaped quotes, '=' and commas inside the literal") {
    // all legal ClickHouse: the label is a string LITERAL, not a token
    assert(CHType.parse("""Enum8('a\'b' = 1)""") == CHEnum(8, Map("a'b" -> 1)))
    assert(CHType.parse("Enum8('a=b' = 1, 'c' = 2)") ==
      CHEnum(8, Map("a=b" -> 1, "c" -> 2)))
    assert(CHType.parse("Enum16('x,y' = -3)") == CHEnum(16, Map("x,y" -> -3)))
    assert(CHType.parse("""Enum8('back\\slash' = 7)""") ==
      CHEnum(8, Map("back\\slash" -> 7)))
    // negative ids are legal for enums
    assert(CHType.parse("Enum8('neg' = -128, 'pos' = 127)") ==
      CHEnum(8, Map("neg" -> -128, "pos" -> 127)))
  }

  test("spark type mapping") {
    assert(CHType.parse("UInt64").sparkType == DecimalType(20, 0))
    assert(CHType.parse("UInt8").sparkType == ShortType)
    assert(CHType.parse("Int8").sparkType == ByteType)
    assert(CHType.parse("LowCardinality(String)").sparkType == StringType)
    assert(CHType.parse("Array(Map(String,String))").sparkType ==
      ArrayType(MapType(StringType, StringType)))
  }

  // ---- conversion matrix ----
  private def conv(v: Any, from: DataType, to: String): Any = {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(v)),
      StructType(Seq(StructField("c", from))))
    df.select(CHCast.convert(col("c"), from, CHType.parse(to)).as("o")).head.get(0)
  }

  test("integer narrowing is range checked") {
    assert(conv(100L, LongType, "Int8") == 100.toByte)
    assert(conv(300L, LongType, "Int8") == null)           // overflow → error
    assert(conv(-1L, LongType, "UInt32") == null)          // negative → error
    assert(conv(4294967295L, LongType, "UInt32") == 4294967295L)
    assert(conv(4294967296L, LongType, "UInt32") == null)
    assert(conv(12L, LongType, "UInt64") == java.math.BigDecimal.valueOf(12).setScale(0))
    assert(conv(-5L, LongType, "UInt64") == null)
  }

  test("strict pairings") {
    assert(conv(1.5, DoubleType, "Int32") == null)         // float → Int = error
    assert(conv(3L, LongType, "Float64") == 3.0)           // int → Float ok
    assert(conv("x", StringType, "Bool") == null)
    assert(conv(true, BooleanType, "Bool") == true)
    assert(conv(5L, LongType, "String") == null)           // non-string → String = error
  }

  test("string family") {
    assert(conv("abc", StringType, "FixedString(3)") == "abc")
    assert(conv("abcd", StringType, "FixedString(3)") == null)
    assert(conv("ok", StringType, "LowCardinality(String)") == "ok")
    assert(conv("9baea34c-08b2-4ea7-9a32-1575e2048cdb", StringType, "UUID")
      == "9baea34c-08b2-4ea7-9a32-1575e2048cdb")
    assert(conv("not-a-uuid", StringType, "UUID") == null)
    assert(conv("a", StringType, "Enum8('a' = 1, 'b' = 2)") == "a")
    assert(conv("z", StringType, "Enum8('a' = 1, 'b' = 2)") == null)
  }

  test("datetime from int seconds, float seconds, strings") {
    val expect = java.sql.Timestamp.valueOf("2025-01-01 10:00:00")
    assert(conv(1735725600L, LongType, "DateTime") == expect)
    assert(conv(1735725600.75, DoubleType, "DateTime") == expect) // truncated to secs
    assert(conv("2025-01-01T10:00:00Z", StringType, "DateTime") == expect)
    assert(conv("2025-01-01 10:00:00", StringType, "DateTime") == expect)
    assert(conv("01/01/2025 10:00:00", StringType, "DateTime") == expect)
    assert(conv("garbage", StringType, "DateTime") == null)
    // DateTime64(3): millisecond precision kept
    assert(conv("2025-01-01T10:00:00.123Z", StringType, "DateTime64(3)")
      == java.sql.Timestamp.valueOf("2025-01-01 10:00:00.123"))
  }

  test("datetime column timezone applies to naive strings only") {
    // naive wall clock in the column's tz: 10:00 in UTC+2 = 08:00 UTC
    // (session tz is UTC, so the returned Timestamp renders UTC wall clock)
    assert(conv("2025-01-01 10:00:00", StringType, "DateTime64(3, 'Europe/Berlin')")
      == java.sql.Timestamp.valueOf("2025-01-01 09:00:00"))
    assert(conv("2025-06-01 10:00:00", StringType, "DateTime64(3, 'Europe/Berlin')")
      == java.sql.Timestamp.valueOf("2025-06-01 08:00:00")) // DST
    assert(conv("2025-01-01 10:00:00", StringType, "DateTime('America/New_York')")
      == java.sql.Timestamp.valueOf("2025-01-01 15:00:00"))
    // explicit offset / Z / unix numerics are absolute — tz ignored
    assert(conv("2025-01-01T10:00:00Z", StringType, "DateTime64(3, 'Europe/Berlin')")
      == java.sql.Timestamp.valueOf("2025-01-01 10:00:00"))
    assert(conv("2025-01-01T10:00:00+02:00", StringType, "DateTime64(3, 'Asia/Tokyo')")
      == java.sql.Timestamp.valueOf("2025-01-01 08:00:00"))
    assert(conv(1735725600L, LongType, "DateTime64(0, 'Asia/Tokyo')")
      == java.sql.Timestamp.valueOf("2025-01-01 10:00:00"))
  }

  test("map value coercion and null-map→empty-map") {
    val from = MapType(StringType, LongType)
    assert(conv(Map("a" -> 1L), from, "Map(String, String)") ==
      Map("a" -> "1"))
    assert(conv(null, from, "Map(String, String)") == Map())
    val nested = MapType(StringType, ArrayType(LongType))
    assert(conv(Map("a" -> Seq(1L, 2L)), nested, "Map(String, String)") ==
      Map("a" -> "[1,2]")) // complex values JSON-encoded
  }

  test("arrays: element conversion, Array(Map) deep, JSON-string fallback") {
    assert(conv(Seq(1L, 2L), ArrayType(LongType), "Array(Int32)") == Seq(1, 2))
    assert(conv(Seq(Map("k" -> 1L)), ArrayType(MapType(StringType, LongType)),
      "Array(Map(String, String))") == Seq(Map("k" -> "1")))
    assert(conv(Seq("a", "b"), ArrayType(StringType), "String") == """["a","b"]""")
  }

  // ---- engine schema ----
  test("engine type normalization and schema building") {
    assert(EngineSchema.normalize("int32") == "int")
    assert(EngineSchema.normalize("uint8") == "uint")
    assert(EngineSchema.normalize("float32") == "float")
    assert(EngineSchema.normalize("bytes") == "string")
    assert(EngineSchema.structFor(Seq("id" -> "string", "n" -> "int64")) ==
      StructType(Seq(StructField("id", StringType), StructField("n", LongType))))
    assert(EngineSchema.isBackwardCompatible(
      Seq("a" -> "int32"), Seq("a" -> "int64", "b" -> "string")))
    assert(!EngineSchema.isBackwardCompatible(
      Seq("a" -> "int32"), Seq("a" -> "string")))
    assert(!EngineSchema.isBackwardCompatible(
      Seq("a" -> "int32", "b" -> "bool"), Seq("a" -> "int64")))
  }
}
