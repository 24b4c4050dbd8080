package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Replays the reference's join BDD feature
  * (glassflow-api/tests/features/join/join.feature) through the REAL
  * control plane: POST /api/v1/pipeline with a temporal-join config →
  * POST /{id}/start (config-only start builds one source per join side) →
  * events through per-topic MemoryStream seams → sink assertion. The
  * event tables and expected results are the feature's own; timestamps are
  * pinned (left at T, right at T+1s, inside the 2s TTLs) so the scenario
  * is deterministic rather than sleep-raced. */
class JoinFeatureSpec extends SparkSpec {

  private val base = 1735689600000L // 2025-01-01T00:00:00Z

  private def joinConfig(id: String): String =
    s"""{"pipeline_id": "$id",
       |  "source": {"kind": "kafka", "brokers": ["broker:9092"],
       |    "topics": [{"name": "left_stream"}, {"name": "right_stream"}]},
       |  "join": {"enabled": true, "sources": [
       |      {"source_id": "left_stream", "join_key": "id", "time_window": "2s",
       |       "orientation": "left", "time_field": "ts"},
       |      {"source_id": "right_stream", "join_key": "id", "time_window": "2s",
       |       "orientation": "right", "time_field": "ts"}],
       |    "projections": [
       |      {"source_id": "left_stream", "field": "id", "output_name": "id"},
       |      {"source_id": "left_stream", "field": "name", "output_name": "name"},
       |      {"source_id": "right_stream", "field": "email", "output_name": "email"}]},
       |  "sink": {"url": "jdbc:ch://ch:8123", "table": "out",
       |    "table_mapping": [
       |      {"field_name": "id", "column_name": "id", "column_type": "String"},
       |      {"field_name": "name", "column_name": "name", "column_type": "String"},
       |      {"field_name": "email", "column_name": "email", "column_type": "String"}]}}
       |""".stripMargin

  /** One feature scenario: publish `lefts` then `rights` (id → payload,
    * with per-event ms offsets from the base instant), expect exactly
    * `expect` as (id, name, email) rows in the sink. */
  private def runScenario(pipelineId: String,
                          lefts: Seq[(String, String, Long)],
                          rights: Seq[(String, String, Long)],
                          expect: Set[(String, String, String)]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val leftMem = MemoryStream[(String, String, Long)]
    val rightMem = MemoryStream[(String, String, Long)]
    def stamped(df: DataFrame, cols: Seq[String]): DataFrame =
      df.toDF(cols :+ "off": _*)
        .withColumn("ts", timestamp_millis(lit(base) + col("off"))).drop("off")
    val leftDf = stamped(leftMem.toDF, Seq("id", "name"))
    val rightDf = stamped(rightMem.toDF, Seq("id", "email"))
    val outName = s"join_feature_${pipelineId.replace('-', '_')}"

    val svc = new PipelineService(spark,
      checkpointRoot = Some(Files.createTempDirectory("graft_jf_ckpt").toString),
      sourceReader = (_, kc) => {
        assert(kc.brokers == Seq("broker:9092"))
        kc.topic match {
          case "left_stream" => leftDf
          case "right_stream" => rightDf
          case other => fail(s"unexpected topic $other")
        }
      },
      sinkAttach = (df, cc, checkpoint, _) => {
        assert(cc.mappings.map(_.column) == Seq("id", "name", "email"))
        df.writeStream.format("memory").queryName(outName).outputMode("append")
      })
    val server = new graft.api.ApiServer(spark, svc)
    val port = server.start()
    val client = java.net.http.HttpClient.newHttpClient()
    def post(path: String, body: String = ""): Int =
      client.send(java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    try {
      assert(post("/api/v1/pipeline", joinConfig(pipelineId)) == 201)
      assert(post(s"/api/v1/pipeline/$pipelineId/start") == 200)
      assert(svc.get(pipelineId).map(_._2).contains(PipelineService.Running))
      val q = spark.streams.active.find(_.name == outName).getOrElse(
        fail(s"no active query named $outName"))
      // the feature publishes the left table first, then the right table
      leftMem.addData(lefts: _*)
      q.processAllAvailable()
      rightMem.addData(rights: _*)
      q.processAllAvailable()
      val got = spark.table(outName).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(got == expect)
      assert(spark.table(outName).count() == expect.size,
        "exactly one row per expected match — no duplicates")
      assert(post(s"/api/v1/pipeline/$pipelineId/stop") == 200)
    } finally {
      try svc.terminate(pipelineId) catch { case _: Exception => () }
      server.stop()
    }
  }

  test("join.feature: Basic join of 2 streams") {
    runScenario("join-test-basic",
      lefts = Seq(("1", "Alice", 0L), ("2", "Bob", 1L), ("3", "Charlie", 2L)),
      rights = Seq(("2", "bob@mailbox.com", 1000L), ("1", "alice@gmail.com", 1001L)),
      expect = Set(
        ("2", "Bob", "bob@mailbox.com"),
        ("1", "Alice", "alice@gmail.com")))
    // id 3 (Charlie) has no right match and must not appear — checked by
    // the exact-set equality above.
  }

  test("join.feature: Join 2 streams with multiple events per same key") {
    runScenario("join-test-multiple",
      lefts = Seq(("1", "Alice", 0L), ("2", "Bob", 1L), ("1", "Charlie", 2L)),
      rights = Seq(("2", "bob@mailbox.com", 1000L), ("1", "service@gmail.com", 1001L)),
      expect = Set(
        ("2", "Bob", "bob@mailbox.com"),
        ("1", "Alice", "service@gmail.com"),
        ("1", "Charlie", "service@gmail.com")))
  }

  test("join.feature: Join 2 streams with no matching key") {
    runScenario("join-test-nomatch",
      lefts = Seq(("1", "Alice", 0L), ("2", "Bob", 1L), ("1", "Charlie", 2L)),
      rights = Seq(("3", "david@mailbox.com", 1000L), ("4", "dnc@gmail.com", 1001L)),
      expect = Set.empty)
  }

  test("join.feature: Stop join gracefully") {
    runScenario("join-test-graceful",
      lefts = Seq(("1", "Alice", 0L), ("2", "Bob", 1L), ("3", "Charlie", 2L),
        ("4", "David", 3L), ("5", "Eve", 4L), ("6", "Frank", 5L), ("7", "Grace", 6L)),
      rights = Seq(("4", "box4@mailbox.com", 1000L), ("5", "box4@mailbox.com", 1001L)),
      expect = Set(
        ("4", "David", "box4@mailbox.com"),
        ("5", "Eve", "box4@mailbox.com")))
  }

  test("join.feature: expired left events do not join (TTL horizon)") {
    // beyond the feature's tables: a right arriving AFTER the 2s left TTL
    // must not drain the buffered left — the expiry leg of temporal.go's
    // TTL contract, deterministic here because time is the event's own.
    runScenario("join-test-expired",
      lefts = Seq(("1", "Alice", 0L)),
      rights = Seq(("1", "late@mailbox.com", 5000L)), // 5s later, TTL is 2s
      expect = Set.empty)
  }
}
