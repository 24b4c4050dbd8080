package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{ObjectMapper, PropertyNamingStrategies}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.operators.TransformOp
import graft.pipeline.{ExpressionService, PipelineConfig, PipelineService}
import graft.types.EngineSchema

/** REST facade — the reference's HTTP API surface
  * (glassflow-api/internal/api/router.go:77-104) on the JDK's built-in
  * HttpServer (zero extra dependencies):
  *
  *   GET    /healthz, /api/v1/healthz, /api/v2/healthz
  *   GET    /api/v1/platform                      engine/runtime info
  *   POST   /api/v1/pipeline                      create (validate + register)
  *   GET    /api/v1/pipeline                      list
  *   GET    /api/v1/pipeline/{id}                 get config + status
  *   POST   /api/v1/pipeline/{id}/start           start from stored config
  *   POST   /api/v1/pipeline/{id}/stop            stop (resumable)
  *   POST   /api/v1/pipeline/{id}/resume          restart from checkpoint
  *   POST   /api/v1/pipeline/{id}/terminate       terminate
  *   POST   /api/v1/pipeline/{id}/edit            replace config (not running)
  *   PATCH  /api/v1/pipeline/{id}/metadata        {name?, metadata?}
  *   GET    /api/v1/pipeline/{id}/health          status + live query signals
  *   GET    /api/v1/pipeline/{id}/resources       per-component resources
  *   PATCH  /api/v1/pipeline/{id}/resources       merge-patch resources
  *   GET    /api/v1/pipeline/{id}/resources/validation
  *   POST   /api/v1/pipeline/migrate-preview      pure v2→v3 config transform
  *   DELETE /api/v1/pipeline/{id}                 delete
  *   POST   /api/v1/filter/validate               {expression, schema_fields}
  *   POST   /api/v1/transform/expression/evaluate {rules, sample}
  *   GET    /api/v1/pipeline/{id}/dlq/state       per-pipeline DLQ (server-
  *   GET    /api/v1/pipeline/{id}/dlq/consume       side path resolution,
  *   POST   /api/v1/pipeline/{id}/dlq/ack           router.go:79-81)
  *   POST   /api/v1/pipeline/{id}/dlq/purge
  *   GET    /internal/pipelines/{id}/otlp-config  OTLP routing descriptor
  *   GET    /api/v1/dlq/state?path=…              ops DLQ access (confined)
  *   POST   /api/v1/dlq/purge?path=…              purge DLQ (confined)
  *   GET    /api/v1/openapi.json, /api/v1/docs    machine/human route list
  *
  * `{id}/start` builds the Kafka source and ClickHouse sink from the
  * STORED config (PipelineService.startFromConfig) — config-only start,
  * like the reference's operator. Pipelines needing runtime-constructed
  * sources (joins, custom frames) use the programmatic
  * PipelineService.start API instead.
  */
object ApiServer {
  /** platform.feature's orchestrator vocabulary ({"orchestrator":
    * "local"|"k8s"}) mapped from the Spark master URL. */
  def orchestratorOf(master: String): String = master match {
    case m if m.startsWith("local") => "local"
    case m if m.startsWith("k8s") => "k8s"
    case _ => "cluster"
  }
}

final class ApiServer(spark: SparkSession, service: PipelineService) {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.setPropertyNamingStrategy(PropertyNamingStrategies.SNAKE_CASE)
    m
  }

  private var server: HttpServer = _

  /** Start on an ephemeral (or given) port; returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/healthz", (ex: HttpExchange) =>
      respond(ex, 200, Map("status" -> "ok")))
    server.createContext("/api/v1/healthz", (ex: HttpExchange) => // router.go:104
      respond(ex, 200, Map("status" -> "ok")))
    server.createContext("/api/v2/healthz", (ex: HttpExchange) =>
      respond(ex, 200, Map("status" -> "ok", "version" -> "v2")))
    server.createContext("/api/v1/platform", (ex: HttpExchange) =>
      // `orchestrator` is the key the reference's clients read
      // (platform.feature: {"orchestrator": "local"|"k8s"}); the Spark
      // analog maps the master URL onto the same vocabulary
      respond(ex, 200, Map(
        "platform" -> "spark",
        "orchestrator" -> ApiServer.orchestratorOf(spark.sparkContext.master),
        "spark_version" -> spark.version,
        "master" -> spark.sparkContext.master,
        "default_parallelism" -> spark.sparkContext.defaultParallelism)))
    server.createContext("/api/v1/pipeline", handlePipeline _)
    server.createContext("/api/v1/filter/validate", handleValidateFilter _)
    server.createContext("/api/v1/transform/expression/evaluate", handleEvaluate _)
    server.createContext("/api/v1/dlq", handleDlq _)
    server.createContext("/internal/pipelines", handleOtlpConfig _)
    server.createContext("/api/v1/openapi.json", (ex: HttpExchange) =>
      respond(ex, 200, openApi))
    server.createContext("/api/v1/docs", (ex: HttpExchange) =>
      respond(ex, 200, openApi))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ---- handlers ----

  private def handlePipeline(ex: HttpExchange): Unit = safely(ex) {
    val path = ex.getRequestURI.getPath.stripPrefix("/api/v1/pipeline")
    (ex.getRequestMethod, path.split('/').filter(_.nonEmpty).toList) match {
      case ("POST", Nil) =>
        // accepts the native shape AND the reference's public v2/v3 wire
        // shapes (the demo files its users run today) — sniffed + adapted
        val cfg = graft.pipeline.ReferenceConfig.fromJson(body(ex))
        service.create(cfg) match {
          case Right(id) => respond(ex, 201, Map("pipeline_id" -> id))
          case Left(err) => respond(ex, 400, Map("error" -> err))
        }
      case ("GET", Nil) =>
        respond(ex, 200, service.list().map { case (id, st) =>
          Map("pipeline_id" -> id, "status" -> st.toString) })
      case ("GET", id :: Nil) =>
        service.get(id) match {
          case Some((cfg, st)) => respond(ex, 200,
            Map("pipeline_id" -> id, "status" -> st.toString, "config" -> cfg))
          case None => respond(ex, 404, Map("error" -> s"no such pipeline: $id"))
        }
      case ("POST", "migrate-preview" :: Nil) =>
        val cfg = PipelineConfig.fromJson(body(ex))
        respond(ex, 200, graft.pipeline.MigratePreview.toV3(cfg))
      case ("POST", id :: "start" :: Nil) =>
        either(ex, service.startFromConfig(id))
      case ("POST", id :: "stop" :: Nil) =>
        either(ex, service.stop(id))
      case ("POST", id :: "resume" :: Nil) =>
        either(ex, service.resume(id))
      case ("POST", id :: "terminate" :: Nil) =>
        either(ex, service.terminate(id))
      case ("POST", id :: "edit" :: Nil) =>
        either(ex, service.edit(id, graft.pipeline.ReferenceConfig.fromJson(body(ex))))
      case ("PATCH", id :: "metadata" :: Nil) =>
        val req = mapper.readTree(body(ex))
        val name = Option(req.get("name")).map(_.asText())
        val meta = Option(req.get("metadata")).map { m =>
          val b = Map.newBuilder[String, String]
          val it = m.fields()
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
          b.result()
        }
        either(ex, service.patchMeta(id, name, meta))
      case ("GET", id :: "health" :: Nil) =>
        service.health(id) match {
          case Right(h) => respond(ex, 200, h)
          case Left(err) => respond(ex, 404, Map("error" -> err))
        }
      case ("GET", id :: "resources" :: Nil) =>
        service.resources(id) match {
          case Right(r) => respond(ex, 200, r)
          case Left(err) => respond(ex, 404, Map("error" -> err))
        }
      case ("PATCH", id :: "resources" :: Nil) =>
        val patch = mapper.readValue(body(ex),
          new com.fasterxml.jackson.core.`type`.TypeReference[Map[String, PipelineService.Resources]] {})
        service.patchResources(id, patch) match {
          case Right(r) => respond(ex, 200, r)
          case Left(err) => respond(ex, 400, Map("error" -> err))
        }
      case ("GET", id :: "resources" :: "validation" :: Nil) =>
        // stored resources are validated on write; report them as valid
        service.resources(id) match {
          case Right(r) => respond(ex, 200, Map("valid" -> true, "resources" -> r))
          case Left(err) => respond(ex, 404, Map("error" -> err))
        }
      case ("DELETE", id :: Nil) =>
        either(ex, service.delete(id))
      // per-pipeline DLQ — the queue is resolved server-side from the id
      // (reference router.go:79-81); unknown pipeline → 404
      case ("GET", id :: "dlq" :: "state" :: Nil) =>
        service.pipelineDlqState(id) match {
          case Right((total, acked)) => respond(ex, 200, Map("pipeline_id" -> id,
            "rows" -> total, "acked" -> acked, "pending" -> (total - acked)))
          case Left(err) => respond(ex, errCode(err), Map("error" -> err))
        }
      case ("GET", id :: "dlq" :: "consume" :: Nil) =>
        service.pipelineDlqConsume(id, query(ex).getOrElse("limit", "100").toInt) match {
          case Right(msgs) => respond(ex, 200, msgs)
          case Left(err) => respond(ex, errCode(err), Map("error" -> err))
        }
      case ("POST", id :: "dlq" :: "ack" :: Nil) =>
        service.pipelineDlqAck(id, query(ex).getOrElse("count", "0").toLong) match {
          case Right(cursor) => respond(ex, 200, Map("acked" -> cursor))
          case Left(err) => respond(ex, errCode(err), Map("error" -> err))
        }
      case ("POST", id :: "dlq" :: "purge" :: Nil) =>
        service.pipelineDlqPurge(id) match {
          case Right(_) => respond(ex, 200, Map("purged" -> true))
          case Left(err) => respond(ex, errCode(err), Map("error" -> err))
        }
      case (m, p) => respond(ex, 405, Map("error" -> s"unsupported: $m /$p"))
    }
  }

  private def errCode(err: String): Int =
    if (err.startsWith("no such pipeline")) 404 else 400

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split('&')
      .flatMap(_.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None })
      .toMap

  private def handleOtlpConfig(ex: HttpExchange): Unit = safely(ex) {
    val segs = ex.getRequestURI.getPath.stripPrefix("/internal/pipelines")
      .split('/').filter(_.nonEmpty).toList
    segs match {
      case id :: "otlp-config" :: Nil if ex.getRequestMethod == "GET" =>
        service.otlpConfig(id) match {
          case Right(cfg) => respond(ex, 200, cfg)
          case Left(err) => respond(ex, errCode(err), Map("error" -> err))
        }
      case other => respond(ex, 404, Map("error" -> s"unknown internal route: $other"))
    }
  }

  /** Minimal machine-readable route inventory (reference serves swagger
    * docs; the JDK server has no generator, so the surface is listed
    * explicitly). */
  private val openApi: Map[String, Any] = Map(
    "openapi" -> "3.0.0",
    "info" -> Map("title" -> "graft pipeline API", "version" -> "v1"),
    "paths" -> Seq(
      "GET /healthz", "GET /api/v2/healthz", "GET /api/v1/platform",
      "POST /api/v1/pipeline", "GET /api/v1/pipeline",
      "GET /api/v1/pipeline/{id}", "DELETE /api/v1/pipeline/{id}",
      "POST /api/v1/pipeline/{id}/start",
      "POST /api/v1/pipeline/{id}/stop", "POST /api/v1/pipeline/{id}/resume",
      "POST /api/v1/pipeline/{id}/terminate", "POST /api/v1/pipeline/{id}/edit",
      "PATCH /api/v1/pipeline/{id}/metadata", "GET /api/v1/pipeline/{id}/health",
      "GET /api/v1/pipeline/{id}/resources", "PATCH /api/v1/pipeline/{id}/resources",
      "GET /api/v1/pipeline/{id}/resources/validation",
      "POST /api/v1/pipeline/migrate-preview",
      "POST /api/v1/filter/validate", "POST /api/v1/transform/expression/evaluate",
      "GET /api/v1/pipeline/{id}/dlq/state", "GET /api/v1/pipeline/{id}/dlq/consume",
      "POST /api/v1/pipeline/{id}/dlq/ack", "POST /api/v1/pipeline/{id}/dlq/purge",
      "GET /api/v1/dlq/state", "GET /api/v1/dlq/consume",
      "POST /api/v1/dlq/ack", "POST /api/v1/dlq/purge",
      "GET /internal/pipelines/{id}/otlp-config",
      "GET /api/v1/openapi.json", "GET /api/v1/docs"))

  private def handleValidateFilter(ex: HttpExchange): Unit = safely(ex) {
    val req = mapper.readTree(body(ex))
    val expression = req.get("expression").asText()
    // the reference's wire shape is `fields: [{field_name, field_type}]`
    // (models.StreamDataField, validate_filter.go:22-27); `schema_fields:
    // [{name, type}]` is accepted as the flattened alternative
    val fields = Option(req.get("fields")).orElse(Option(req.get("schema_fields")))
      .map(_.elements())
      .map { it =>
        val b = Seq.newBuilder[(String, String)]
        while (it.hasNext) {
          val f = it.next()
          val n = Option(f.get("field_name")).getOrElse(f.get("name")).asText()
          val t = Option(f.get("field_type")).getOrElse(f.get("type")).asText()
          b += n -> t
        }
        b.result()
      }.getOrElse(Seq.empty)
    ExpressionService.validateFilter(expression, EngineSchema.structFor(fields)) match {
      case Right(_) => respond(ex, 200, Map("valid" -> true))
      case Left(err) => respond(ex, 400, Map("valid" -> false, "error" -> err))
    }
  }

  private def handleEvaluate(ex: HttpExchange): Unit = safely(ex) {
    val req = mapper.readTree(body(ex))
    val rules = {
      val it = req.get("rules").elements()
      val b = Seq.newBuilder[TransformOp.Rule]
      while (it.hasNext) {
        val r = it.next()
        b += TransformOp.Rule(r.get("expression").asText(),
          r.get("output_name").asText(), r.get("output_type").asText())
      }
      b.result()
    }
    val sample = req.get("sample").toString
    ExpressionService.evaluateTransform(spark, rules, sample) match {
      case Right(json) => respondRaw(ex, 200, json)
      case Left(err) => respond(ex, 400, Map("error" -> err))
    }
  }

  private def handleDlq(ex: HttpExchange): Unit = safely(ex) {
    val uri = ex.getRequestURI
    val params = Option(uri.getQuery).getOrElse("").split('&')
      .flatMap(_.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None })
      .toMap
    val path = params.getOrElse("path",
      return respond(ex, 400, Map("error" -> "missing ?path=")))
    // paths are confined to the service's configured DLQ root (traversal
    // outside it → 400); see PipelineService.resolveDlq
    uri.getPath.stripPrefix("/api/v1/dlq/") match {
      case "state" => service.dlqState(path) match {
        case Right((total, acked)) => respond(ex, 200,
          Map("rows" -> total, "acked" -> acked, "pending" -> (total - acked)))
        case Left(err) => respond(ex, 400, Map("error" -> err))
      }
      case "consume" =>
        service.dlqConsume(path, params.getOrElse("limit", "100").toInt) match {
          case Right(msgs) => respond(ex, 200, msgs)
          case Left(err) => respond(ex, 400, Map("error" -> err))
        }
      case "ack" if ex.getRequestMethod == "POST" =>
        service.dlqAck(path, params.getOrElse("count", "0").toLong) match {
          case Right(cursor) => respond(ex, 200, Map("acked" -> cursor))
          case Left(err) => respond(ex, 400, Map("error" -> err))
        }
      case "purge" if ex.getRequestMethod == "POST" =>
        service.dlqPurge(path) match {
          case Right(_) => respond(ex, 200, Map("purged" -> true))
          case Left(err) => respond(ex, 400, Map("error" -> err))
        }
      case other => respond(ex, 404, Map("error" -> s"unknown dlq op: $other"))
    }
  }

  // ---- plumbing ----

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def either(ex: HttpExchange, r: Either[String, Unit]): Unit = r match {
    case Right(_) => respond(ex, 200, Map("ok" -> true))
    case Left(err) => respond(ex, 400, Map("error" -> err))
  }

  private def respond(ex: HttpExchange, code: Int, payload: Any): Unit =
    respondRaw(ex, code, mapper.writeValueAsString(payload))

  private def respondRaw(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def safely(ex: HttpExchange)(f: => Unit): Unit =
    try f catch {
      case e: Exception =>
        respond(ex, 400, Map("error" -> Option(e.getMessage).getOrElse(e.toString)))
    }
}
