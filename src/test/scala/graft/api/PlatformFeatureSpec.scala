package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.pipeline.PipelineService

/** Replays the reference's two thin API BDD features scenario-for-scenario
  * over a live socket:
  *  - glassflow-api/tests/features/platform/platform.feature (3 scenarios)
  *  - glassflow-api/tests/features/api/validate_filter.feature (2 scenarios)
  * Request bodies are the feature files' own (the validate payload uses the
  * reference's `fields: [{field_name, field_type}]` wire shape). */
class PlatformFeatureSpec extends SparkSpec {

  private lazy val service = new PipelineService(spark)
  private lazy val server = new ApiServer(spark, service)
  private lazy val port = server.start()
  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("platform.feature: Get platform information for local orchestrator") {
    val resp = get("/api/v1/platform")
    assert(resp.statusCode() == 200)
    // "the response should contain JSON {"orchestrator": "local"}" — this
    // session's master IS local
    assert(resp.body().contains("\"orchestrator\":\"local\""))
  }

  test("platform.feature: Get platform information for k8s orchestrator") {
    // the scenario swaps the orchestrator under the server; here the
    // orchestrator derives from the Spark master URL — the k8s mapping is
    // the unit under test
    assert(ApiServer.orchestratorOf("k8s://https://10.0.0.1:6443") == "k8s")
    assert(ApiServer.orchestratorOf("local[4]") == "local")
    assert(ApiServer.orchestratorOf("spark://host:7077") == "cluster")
  }

  test("platform.feature: Platform endpoint returns correct content type") {
    val resp = get("/api/v1/platform")
    assert(resp.headers().firstValue("Content-Type").orElse("")
      .startsWith("application/json"))
  }

  test("validate_filter.feature: Validate a valid filter expression") {
    // the feature's exact body: expression `env == "production"` against
    // fields env:string, value:int32
    val resp = post("/api/v1/filter/validate",
      """{
        |  "expression": "env == \"production\"",
        |  "fields": [
        |    {"field_name": "env", "field_type": "string"},
        |    {"field_name": "value", "field_type": "int32"}
        |  ]
        |}""".stripMargin)
    assert(resp.statusCode() == 200, resp.body())
  }

  test("validate_filter.feature: Reject invalid filter expression") {
    val resp = post("/api/v1/filter/validate",
      """{
        |  "expression": "env == ",
        |  "fields": [
        |    {"field_name": "env", "field_type": "string"}
        |  ]
        |}""".stripMargin)
    assert(resp.statusCode() == 400, resp.body())
  }
}
