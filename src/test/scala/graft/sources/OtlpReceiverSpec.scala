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

  test("OTLP/HTTP protobuf encoding (collector default) lands in the spool") {
    // ExportLogsServiceRequest hand-encoded on the protobuf wire format:
    // resourceLogs { scopeLogs { scope { name } logRecords { time, text } } }
    def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v = v >>> 7 }
      out.write(v.toInt)
    }
    def ld(field: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      varint(out, (field.toLong << 3) | 2); varint(out, payload.length)
      out.write(payload); out.toByteArray
    }
    def strF(field: Int, s: String) = ld(field, s.getBytes("UTF-8"))
    def f64(field: Int, v: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      varint(out, (field.toLong << 3) | 1)
      (0 until 8).foreach(i => out.write(((v >>> (8 * i)) & 0xFF).toInt))
      out.toByteArray
    }
    val record = f64(1, 1735725600000000000L) ++ strF(3, "WARN") ++
      ld(5, strF(1, "proto body"))
    val resource = ld(1, ld(1, strF(1, "service") ++ ld(2, strF(1, "api"))))
    val req = ld(1, resource ++ ld(2, ld(1, strF(1, "protologger")) ++ ld(2, record)))

    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/logs"))
        .header("Content-Type", "application/x-protobuf")
        .POST(HttpRequest.BodyPublishers.ofByteArray(req)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200, resp.body())
    val spooled = spark.read.parquet(s"$spool/logs")
      .filter(org.apache.spark.sql.functions.col("severity_text") === "WARN")
    val row = spooled.head()
    assert(row.getAs[String]("body") == "proto body")
    assert(row.getAs[String]("scope_name") == "protologger")
    assert(row.getAs[String]("timestamp").startsWith("2025-01-01T"))
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

  test("gzip Content-Encoding (otlphttp exporter default) is accepted") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(logsRequest.replace("started", "gzipped").getBytes("UTF-8")); gz.close()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/logs"))
        .header("Content-Encoding", "gzip")
        .POST(HttpRequest.BodyPublishers.ofByteArray(bos.toByteArray)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200, resp.body())
    assert(spark.read.parquet(s"$spool/logs")
      .filter(org.apache.spark.sql.functions.col("body") === "gzipped").count() == 1)
  }

  test("malformed payloads are a clean 400, nothing spooled") {
    assert(post("/v1/metrics", "{ not json")._1 == 400)
    assert(post("/v1/metrics", """{"wrongShape": true}""")._1 == 400)
    assert(!new java.io.File(s"$spool/metrics").exists())
  }
}
