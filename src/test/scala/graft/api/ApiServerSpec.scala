package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.pipeline.PipelineService

class ApiServerSpec extends SparkSpec {

  private lazy val dlqRoot = java.nio.file.Files.createTempDirectory("api_dlq").toString
  private lazy val service = new PipelineService(spark, dlqRoot = Some(dlqRoot))
  private lazy val server = new ApiServer(spark, service)
  private lazy val port = server.start()
  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String): (Int, String) = send(
    HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build())
  private def post(path: String, body: String): (Int, String) = send(
    HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build())
  private def delete(path: String): (Int, String) = send(
    HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).DELETE().build())
  private def send(r: HttpRequest): (Int, String) = {
    val resp = client.send(r, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private val cfgJson =
    """{"pipeline_id": "api-p1",
      |  "source": {"topics": [{"name": "t",
      |    "schema_fields": [{"name": "status", "type": "string"}]}]},
      |  "filter": {"expression": "status != 'failed'"}}""".stripMargin

  test("healthz") {
    assert(get("/healthz") == (200, """{"status":"ok"}"""))
  }

  test("pipeline create / get / list / terminate / delete round-trip") {
    val (c1, b1) = post("/api/v1/pipeline", cfgJson)
    assert(c1 == 201 && b1.contains("api-p1"))
    assert(post("/api/v1/pipeline", cfgJson)._1 == 400) // duplicate

    val (c2, b2) = get("/api/v1/pipeline/api-p1")
    assert(c2 == 200 && b2.contains("\"status\":\"Created\"")
      && b2.contains("status != 'failed'"))

    val (c3, b3) = get("/api/v1/pipeline")
    assert(c3 == 200 && b3.contains("api-p1"))

    assert(post("/api/v1/pipeline/api-p1/terminate", "")._1 == 200)
    assert(delete("/api/v1/pipeline/api-p1")._1 == 200)
    assert(get("/api/v1/pipeline/api-p1")._1 == 404)
  }

  test("malformed create body is a clean 400") {
    val (code, body) = post("/api/v1/pipeline", "this is not json {")
    assert(code == 400 && body.contains("error"))
  }

  test("filter validation endpoint") {
    val good = post("/api/v1/filter/validate",
      """{"expression": "status != 'x' && n > 1",
        |  "schema_fields": [{"name":"status","type":"string"},{"name":"n","type":"int64"}]}""".stripMargin)
    assert(good == (200, """{"valid":true}"""))
    val bad = post("/api/v1/filter/validate",
      """{"expression": "ghost > 1",
        |  "schema_fields": [{"name":"status","type":"string"}]}""".stripMargin)
    assert(bad._1 == 400 && bad._2.contains("unknown field"))
  }

  test("transform evaluation endpoint runs the real engine on a sample") {
    val (code, body) = post("/api/v1/transform/expression/evaluate",
      """{"rules": [
        |   {"expression": "upper(name)", "output_name": "name_u", "output_type": "string"},
        |   {"expression": "n * 2", "output_name": "n2", "output_type": "int64"}],
        | "sample": {"name": "ada", "n": 21}}""".stripMargin)
    assert(code == 200 && body == """{"name_u":"ADA","n2":42}""")
  }

  test("dlq endpoints over http, confined to the configured root") {
    import spark.implicits._
    graft.sink.Dlq.writeParquet(s"$dlqRoot/d")(
      graft.sink.Dlq.envelope("sink", "Code: 53")(Seq(("x", 1)).toDF("id", "n")))
    val (c1, b1) = get("/api/v1/dlq/state?path=d")
    assert(c1 == 200 && b1 == """{"rows":1}""")
    // out-of-root paths are refused, never touched
    assert(post("/api/v1/dlq/purge?path=/tmp", "")._1 == 400)
    assert(post("/api/v1/dlq/purge?path=d/../../etc", "")._1 == 400)
    assert(post("/api/v1/dlq/purge?path=d", "")._1 == 200)
    assert(get("/api/v1/dlq/state?path=d")._2 == """{"rows":0}""")
  }
}
