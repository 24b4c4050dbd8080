package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec

class OtlpReceiverSpec extends SparkSpec {

  private lazy val spool =
    java.nio.file.Files.createTempDirectory("otlp_spool").toString
  private lazy val receiver = new OtlpReceiver(spark, spool)
  private lazy val port = receiver.start()
  private lazy val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private val logsRequest =
    """{"resourceLogs": [{
      |  "resource": {"attributes": [
      |    {"key": "service.name", "value": {"stringValue": "api"}}]},
      |  "scopeLogs": [{
      |    "scope": {"name": "applog", "version": "1.0"},
      |    "logRecords": [
      |      {"timeUnixNano": "1735725600000000000", "severityNumber": 9,
      |       "severityText": "INFO", "body": {"stringValue": "started"},
      |       "attributes": [{"key": "k", "value": {"stringValue": "v"}}]},
      |      {"timeUnixNano": "1735725601000000000", "severityNumber": 17,
      |       "severityText": "ERROR", "body": {"stringValue": "boom"}}
      |    ]}]}]}""".stripMargin

  test("OTLP/HTTP logs land flattened in the spool") {
    val (code, body) = post("/v1/logs", logsRequest)
    assert(code == 200 && body.contains("\"partialSuccess\""), body)
    assert(body.contains("\"acceptedRows\":2"))
    val spooled = spark.read.parquet(s"$spool/logs")
    assert(spooled.count() == 2)
    val err = spooled.filter(spooled("severity_text") === "ERROR").head()
    assert(err.getAs[String]("body") == "boom")
    assert(err.getAs[Map[String, String]]("resource_attributes") ==
      Map("service.name" -> "api"))
  }

  test("OTLP/HTTP traces land flattened with computed duration") {
    val req =
      """{"resourceSpans": [{
        |  "resource": {"attributes": []},
        |  "scopeSpans": [{"scope": {"name": "tracer"},
        |    "spans": [{"traceId": "AB12", "spanId": "CD34", "name": "op",
        |      "startTimeUnixNano": "1735725600000000000",
        |      "endTimeUnixNano": "1735725600500000000"}]}]}]}""".stripMargin
    val (code, _) = post("/v1/traces", req)
    assert(code == 200)
    val row = spark.read.parquet(s"$spool/traces").head()
    assert(row.getAs[String]("trace_id") == "ab12") // ids lowercased
    assert(row.getAs[Long]("duration_ns") == 500000000L)
  }

  test("malformed payloads are a clean 400, nothing spooled") {
    assert(post("/v1/metrics", "{ not json")._1 == 400)
    assert(post("/v1/metrics", """{"wrongShape": true}""")._1 == 400)
    assert(!new java.io.File(s"$spool/metrics").exists())
  }
}
