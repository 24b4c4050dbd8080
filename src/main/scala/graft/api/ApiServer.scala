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
  *   GET    /healthz
  *   POST   /api/v1/pipeline                      create (validate + register)
  *   GET    /api/v1/pipeline                      list
  *   GET    /api/v1/pipeline/{id}                 get config + status
  *   POST   /api/v1/pipeline/{id}/stop            stop (resumable)
  *   POST   /api/v1/pipeline/{id}/terminate       terminate
  *   DELETE /api/v1/pipeline/{id}                 delete
  *   POST   /api/v1/filter/validate               {expression, schema_fields}
  *   POST   /api/v1/transform/expression/evaluate {rules, sample}
  *   GET    /api/v1/dlq/state?path=…              DLQ row count
  *   POST   /api/v1/dlq/purge?path=…              purge DLQ
  *
  * Starting a pipeline binds it to live sources/sinks, which are runtime
  * objects — that stays on the programmatic PipelineService.start API
  * (the reference likewise delegates actual pod startup to its operator).
  */
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
    server.createContext("/api/v1/pipeline", handlePipeline _)
    server.createContext("/api/v1/filter/validate", handleValidateFilter _)
    server.createContext("/api/v1/transform/expression/evaluate", handleEvaluate _)
    server.createContext("/api/v1/dlq", handleDlq _)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ---- handlers ----

  private def handlePipeline(ex: HttpExchange): Unit = safely(ex) {
    val path = ex.getRequestURI.getPath.stripPrefix("/api/v1/pipeline")
    (ex.getRequestMethod, path.split('/').filter(_.nonEmpty).toList) match {
      case ("POST", Nil) =>
        val cfg = PipelineConfig.fromJson(body(ex))
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
      case ("POST", id :: "stop" :: Nil) =>
        either(ex, service.stop(id))
      case ("POST", id :: "terminate" :: Nil) =>
        either(ex, service.terminate(id))
      case ("DELETE", id :: Nil) =>
        either(ex, service.delete(id))
      case (m, p) => respond(ex, 405, Map("error" -> s"unsupported: $m /$p"))
    }
  }

  private def handleValidateFilter(ex: HttpExchange): Unit = safely(ex) {
    val req = mapper.readTree(body(ex))
    val expression = req.get("expression").asText()
    val fields = Option(req.get("schema_fields")).map(_.elements())
      .map { it =>
        val b = Seq.newBuilder[(String, String)]
        while (it.hasNext) { val f = it.next(); b += f.get("name").asText() -> f.get("type").asText() }
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
        case Right(n) => respond(ex, 200, Map("rows" -> n))
        case Left(err) => respond(ex, 400, Map("error" -> err))
      }
      case "consume" =>
        service.dlqConsume(path, params.getOrElse("limit", "100").toInt) match {
          case Right(msgs) => respond(ex, 200, msgs)
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
