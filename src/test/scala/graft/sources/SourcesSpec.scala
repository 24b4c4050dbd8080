package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("kafka options: plain, sasl, tls combinations") {
    val base = KafkaSource.Config(Seq("b1:9092", "b2:9092"), "t1", "cg")
    val o1 = KafkaSource.options(base)
    assert(o1("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(o1("subscribe") == "t1")
    assert(o1("startingOffsets") == "earliest")
    assert(!o1.contains("kafka.security.protocol"))

    val o2 = KafkaSource.options(base.copy(
      saslMechanism = Some("SCRAM-SHA-256"),
      saslUsername = Some("u"), saslPassword = Some("p"), tlsEnabled = true))
    assert(o2("kafka.security.protocol") == "SASL_SSL")
    assert(o2("kafka.sasl.mechanism") == "SCRAM-SHA-256")
    assert(o2("kafka.sasl.jaas.config").contains("ScramLoginModule"))

    val o3 = KafkaSource.options(base.copy(tlsEnabled = true))
    assert(o3("kafka.security.protocol") == "SSL")

    assertThrows[IllegalArgumentException](
      KafkaSource.options(base.copy(initialOffset = "nonsense")))
    assertThrows[IllegalArgumentException](
      KafkaSource.options(base.copy(saslMechanism = Some("GSSAPI-NOPE"))))
  }

  test("schema registry wire-format prefix is stripped, schema id extracted") {
    val framed = Array[Byte](0, 0, 0, 1, 42) ++ """{"a":1}""".getBytes("UTF-8")
    val unframed = """{"a":2}""".getBytes("UTF-8")
    val df = Seq(Tuple1(framed), Tuple1(unframed)).toDF("value")
    val (payload, schemaId) = JsonIngest.stripSchemaRegistryPrefix(col("value"))
    val out = df.select(payload.as("p"), schemaId.as("id")).collect()
    assert(out(0).getString(0) == """{"a":1}""")
    assert(out(0).getLong(1) == 298L) // 0x0000012A = 298
    assert(out(1).getString(0) == """{"a":2}""")
    assert(out(1).isNullAt(1))
  }

  test("json ingest splits corrupt rows to DLQ") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("n", LongType)))
    val df = Seq(
      """{"id":"a","n":1}""",
      """not json at all""",
      """{"unrelated":true}"""
    ).toDF("value")
    val (good, dlq) = JsonIngest.ingest(df, "value", schema)
    assert(good.collect().map(_.getString(0)).toSeq == Seq("a"))
    val dlqRows = dlq.collect().map(_.getString(0)).toSeq
    assert(dlqRows.length == 2 && dlqRows.contains("not json at all"))
  }
}
