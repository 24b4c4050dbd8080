package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val fraudJson =
    """{
      |  "pipeline_id": "fraud",
      |  "source": { "topics": [ {
      |    "name": "login_attempts",
      |    "schema_fields": [
      |      {"name": "event_id", "type": "string"},
      |      {"name": "user_id", "type": "string"},
      |      {"name": "status", "type": "string"},
      |      {"name": "ts", "type": "string"} ],
      |    "deduplication": {"enabled": true, "id_field": "event_id"} } ] },
      |  "filter": { "expression": "status != 'failed'" },
      |  "transform": { "rules": [
      |    {"expression": "event_id", "output_name": "event_id", "output_type": "string"},
      |    {"expression": "upper(status)", "output_name": "status", "output_type": "string"} ] },
      |  "sink": { "table": "out", "table_mapping": [
      |    {"field_name": "event_id", "column_name": "event_id", "column_type": "String"},
      |    {"field_name": "status", "column_name": "status", "column_type": "LowCardinality(String)"} ] }
      |}""".stripMargin

  test("parses reference-style snake_case JSON config") {
    val cfg = PipelineConfig.fromJson(fraudJson)
    assert(cfg.pipelineId == "fraud")
    assert(cfg.source.topics.head.deduplication.get.idField == "event_id")
    assert(cfg.filter.get.expression == "status != 'failed'")
    assert(cfg.transform.get.rules.length == 2)
    assert(cfg.sink.get.tableMapping.head.columnType == "String")
  }

  test("window parsing with d suffix") {
    assert(PipelineConfig.windowMillis("90s") == 90000L)
    assert(PipelineConfig.windowMillis("30m") == 1800000L)
    assert(PipelineConfig.windowMillis("2h") == 7200000L)
    assert(PipelineConfig.windowMillis("7d") == 604800000L)
    assertThrows[IllegalArgumentException](PipelineConfig.windowMillis("5y"))
  }

  test("validate catches config errors") {
    val cfg = PipelineConfig.fromJson(fraudJson)
    val schema = StructType(Seq(StructField("status", StringType)))
    assert(PipelineConfig.validate(cfg, Map("login_attempts" -> schema)).isEmpty)
    val badJoin = cfg.copy(join = Some(JoinConfig(enabled = true,
      sources = Seq(JoinSource("a", "k", "1h", "left")))))
    assert(PipelineConfig.validate(badJoin, Map.empty)
      .exists(_.contains("exactly 2 sources")))
    // Decimal/Tuple/IP joined the sink domain in the beyond-reference
    // extension; Nullable-bearing and unknown types are still rejected
    val badSink = cfg.copy(sink = cfg.sink.map(s => s.copy(tableMapping =
      s.tableMapping :+ SinkMapping(None, "x", "x", "Tuple(Nullable(String), Int32)"))))
    assert(PipelineConfig.validate(badSink, Map.empty)
      .exists(_.contains("unsupported column type")))
    val badFilter = cfg.copy(filter = Some(FilterConfig("nope > 1")))
    assert(PipelineConfig.validate(badFilter, Map("login_attempts" -> schema))
      .exists(_.startsWith("filter:")))
  }

  test("batch compile runs the fraud-demo chain: filter → dedup → transform → sink map") {
    val src = Seq(
      ("e1", "u1", "success", "t"),
      ("e1", "u1", "success", "t"),   // duplicate event_id
      ("e2", "u2", "failed", "t"),    // filtered
      ("e3", "u3", "ok", "t")
    ).toDF("event_id", "user_id", "status", "ts")
    val cfg = PipelineConfig.fromJson(fraudJson)
    val out = PipelineCompiler.batch(cfg, Map("login_attempts" -> src))
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("e1", "SUCCESS"), ("e3", "OK")))
  }

  test("batch compile with temporal join across two topics") {
    val orders = Seq((1L, "u1", 100L, 9.99), (2L, "u2", 200L, 5.0))
      .toDF("order_id", "user_id", "ts_ns", "price")
    val users = Seq(("u1", "Ada", 50L), ("u1", "Ada2", 90L), ("u2", "Bob", 500L))
      .toDF("id", "name", "ts_ns")
    val cfg = PipelineConfig(
      pipelineId = "j",
      source = SourceConfig(topics = Seq(TopicConfig("orders"), TopicConfig("users"))),
      join = Some(JoinConfig(enabled = true,
        sources = Seq(
          JoinSource("orders", "user_id", "1h", "left", Some("ts_ns")),
          JoinSource("users", "id", "1h", "right", Some("ts_ns"))),
        projections = Seq(
          JoinProjection("orders", "order_id", "order_id"),
          JoinProjection("orders", "price", "price"),
          JoinProjection("users", "name", "name")))))
    val out = PipelineCompiler.batch(cfg,
      Map("orders" -> orders, "users" -> users)).orderBy("order_id").collect()
    // order 1: latest user row at ts 90 ("Ada2"); order 2: user row is later → dropped
    assert(out.map(r => (r.getLong(0), r.getString(2))).toSeq == Seq((1L, "Ada2")))
  }

  test("streaming compile wires the temporal join for a two-source pipeline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val cfg = PipelineConfig(
      pipelineId = "sj",
      source = SourceConfig(topics = Seq(TopicConfig("orders"), TopicConfig("users"))),
      join = Some(JoinConfig(enabled = true,
        sources = Seq(
          JoinSource("orders", "user_id", "1h", "left", Some("ts")),
          JoinSource("users", "id", "1h", "right", Some("ts"))),
        projections = Seq(
          JoinProjection("orders", "order_id", "order_id"),
          JoinProjection("users", "name", "name")))))
    val orders = MemoryStream[(Long, String, java.sql.Timestamp)]
    val users = MemoryStream[(String, String, java.sql.Timestamp)]
    val joined = PipelineCompiler.streamingJoin(cfg, Map(
      "orders" -> orders.toDF.toDF("order_id", "user_id", "ts"),
      "users" -> users.toDF.toDF("id", "name", "ts")))
    val qn = s"sj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    // u1 has a right value before the order (hit); u2's order precedes its
    // user row (buffer → drained by the later right); u3's right is stale
    users.addData(("u1", "Ada", t("2025-01-01 09:50:00")),
      ("u3", "Cy", t("2025-01-01 07:00:00")))
    orders.addData((1L, "u1", t("2025-01-01 10:00:00")),
      (2L, "u2", t("2025-01-01 10:05:00")),
      (3L, "u3", t("2025-01-01 10:10:00")))
    q.processAllAvailable()
    users.addData(("u2", "Bob", t("2025-01-01 10:20:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(qn).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "Ada"), (2L, "Bob")))
  }
}
