package graft.pipeline

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parses the reference's ACTUAL demo pipeline files (all shapes its users
  * run today: v3 kafka/OTLP/join pipelines and v2 observability pipelines)
  * through [[ReferenceConfig]] — switch-compatibility evidence at the
  * config-file level, not a hand-copied replica. */
class ReferenceDemoSpec extends SparkSpec {
  import spark.implicits._

  private val demoRoot = Paths.get("/root/reference/demos")

  private def demoFiles: Seq[Path] = {
    if (!Files.isDirectory(demoRoot)) return Nil
    Files.walk(demoRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".json"))
      .filter(p => p.toString.contains("glassflow"))
      .filter(p => !p.toString.contains("grafana"))
      .toSeq.sortBy(_.toString)
  }

  private def read(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")

  test("every demo pipeline file parses: id, topics, sink mapping, supported CH types") {
    assume(demoFiles.nonEmpty, "reference demos not present in this environment")
    assert(demoFiles.size >= 10, s"expected >=10 demo files, found ${demoFiles.size}")
    demoFiles.foreach { p =>
      val cfg = ReferenceConfig.fromJson(read(p))
      withClue(s"$p: ") {
        assert(cfg.pipelineId.nonEmpty)
        assert(cfg.source.topics.nonEmpty)
        val sink = cfg.sink.get
        assert(sink.table.nonEmpty)
        assert(sink.tableMapping.nonEmpty, "sink mapping must come through")
        sink.tableMapping.foreach { m =>
          assert(m.fieldName.nonEmpty && m.columnName.nonEmpty)
          assert(graft.types.CHType.isSupported(m.columnType),
            s"unsupported sink column type ${m.columnType}")
        }
      }
    }
  }

  test("fraud-detection demo: chain parses and batch-compiles from the real file") {
    val f = demoRoot.resolve("fraud-detection/glassflow/fraud_detection_pipeline.json")
    assume(Files.exists(f))
    val cfg = ReferenceConfig.fromJson(read(f))
    assert(cfg.pipelineId == "fraud-detection-logins-tested")
    assert(cfg.filter.get.expression == "status != 'failed'")
    val dedup = cfg.source.topics.head.deduplication.get
    assert(dedup.idField == "event_id" && dedup.timeWindow == "1h")
    assert(cfg.sink.get.maxBatchSize.contains(500L))
    assert(cfg.sink.get.maxDelaySeconds.contains(10))
    assert(cfg.source.brokers.get == Seq("kafka.kafka.svc.cluster.local:9092"))

    // the declared filter validates against the declared schema
    val schema = graft.types.EngineSchema.structFor(
      cfg.source.topics.head.schemaFields.map(f => f.name -> f.`type`))
    assert(PipelineConfig.validate(cfg, Map(cfg.source.topics.head.name -> schema)).isEmpty)

    // and the chain runs: duplicate event dropped, failed login filtered
    val src = Seq(
      ("e1", "u1", "failed"), ("e2", "u2", "success"), ("e2", "u2", "success"),
      ("e3", "u3", "locked")).toDF("event_id", "user_id", "status")
    val out = PipelineCompiler.batch(cfg.copy(sink = None),
      Map(cfg.source.topics.head.name -> src))
    assert(out.select("event_id").as[String].collect().sorted.toSeq == Seq("e2", "e3"))
  }

  test("getting-started join demo: left/right sources and output projections") {
    val f = demoRoot.resolve("getting-started/config/glassflow/join_pipeline.json")
    assume(Files.exists(f))
    val cfg = ReferenceConfig.fromJson(read(f))
    val j = cfg.join.get
    assert(j.sources.map(_.orientation) == Seq("left", "right"))
    assert(j.sources.map(_.sourceId) == Seq("orders", "user_events"))
    assert(j.sources.head.joinKey == "user_id")
    assert(j.sources(1).joinKey == "user.id")
    assert(j.projections.size == 8)
    assert(j.projections.head == JoinProjection("orders", "order_id", "order_id"))
    assert(cfg.source.topics.map(_.name) == Seq("user_events", "orders"))
    assert(PipelineConfig.validate(cfg, Map.empty).isEmpty)
  }

  test("getting-started join demo runs the streaming join as-is (arrival-time TTL, dotted key)") {
    val f = demoRoot.resolve("getting-started/config/glassflow/join_pipeline.json")
    assume(Files.exists(f))
    val cfg = ReferenceConfig.fromJson(read(f))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the demo declares user_events fields as dotted names (user.id,
    // user.name, user.email) — model them as a nested struct; the join key
    // and projections must resolve through the nested path
    val userMem = MemoryStream[(String, String, String, String)]
    val users = userMem.toDF.toDF("event_id", "uid", "uname", "uemail")
      .select(col("event_id"),
        struct(col("uid").as("id"), col("uname").as("name"),
          col("uemail").as("email")).as("user"),
        lit("2025-01-01T00:00:00Z").as("created_at"),
        array(lit("vip")).as("tags"))
    val orderMem = MemoryStream[(String, String, Int, Float)]
    val orders = orderMem.toDF.toDF("order_id", "user_id", "amount", "price")
      .withColumn("created_at", lit("2025-01-02T00:00:00Z"))
    val out = PipelineCompiler.streamingJoin(cfg,
      Map("orders" -> orders, "user_events" -> users))
    val q = out.writeStream.format("memory").queryName("demo_join_out")
      .outputMode("append").start()
    // right side (user_events) lands first; a later order joins on arrival
    userMem.addData(("e1", "u1", "Ada", "ada@example.com"))
    q.processAllAvailable()
    orderMem.addData(("o1", "u1", 2, 9.99f))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("demo_join_out").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("order_id") == "o1")
    assert(r.getAs[String]("user.name") == "Ada")   // literal dotted output column
    assert(r.getAs[String]("user.email") == "ada@example.com")
    assert(r.getAs[Int]("amount") == 2)
  }

  test("5g-telemetry demo: OTLP source, dotted dedup key, 9-rule stateless transform") {
    val f = demoRoot.resolve("5g-telemetry/glassflow-pipelines/5g-metrics-pipeline.json")
    assume(Files.exists(f))
    val cfg = ReferenceConfig.fromJson(read(f))
    assert(cfg.source.kind.contains("otlp.metrics"))
    assert(cfg.source.topics.head.deduplication.get.idField == "attributes.measurement_id")
    assert(cfg.filter.get.expression == "metric_name != 'ran.healthcheck'")
    val rules = cfg.transform.get.rules
    assert(rules.nonEmpty && rules.exists(_.outputName == "canonical_cell_id"))
    // every transform expression compiles (elvis, map access, toFloat)
    val env = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("metric_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value_double", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("resource_attributes",
        org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField("attributes",
        org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))))
    rules.foreach { r =>
      withClue(s"${r.expression}: ") {
        assert(graft.exprs.ExprCompiler.validate(r.expression, env).isRight)
      }
    }
  }

  test("5g demo's otlp.metrics source kind reaches the spool path on config start") {
    val f = demoRoot.resolve("5g-telemetry/glassflow-pipelines/5g-metrics-pipeline.json")
    assume(Files.exists(f))
    val cfg0 = ReferenceConfig.fromJson(read(f))
    // give the sink the url a config start needs; source/type untouched
    val cfg = cfg0.copy(sink = cfg0.sink.map(_.copy(url = Some("jdbc:ch://x/default"))))
    val spool = Files.createTempDirectory("otlp_spool").toString
    val svc = new PipelineService(spark, otlpSpoolRoot = Some(spool))
    assert(svc.create(cfg).isRight)
    val r = svc.startFromConfig(cfg.pipelineId)
    // the typed OTLP spelling must route to the spool reader (which then
    // reports an empty spool), not fall through as an unsupported kind
    assert(r.isLeft && r.swap.exists(_.contains("no spool data")), r)
  }

  test("observability v2 demos: schema fields split into engine types and sink columns") {
    val f = demoRoot.resolve("observability/glassflow-pipelines/logs-pipeline.json")
    assume(Files.exists(f))
    val cfg = ReferenceConfig.fromJson(read(f))
    assert(cfg.pipelineId == "logs-pipeline")
    val topic = cfg.source.topics.head
    assert(topic.name == "otel-logs")
    assert(topic.deduplication.isEmpty) // enabled: false in the file
    assert(topic.schemaFields.nonEmpty)
    val sink = cfg.sink.get
    assert(sink.tableMapping.size == topic.schemaFields.size)
    assert(sink.tableMapping.forall(m => graft.types.CHType.isSupported(m.columnType)))
  }
}
