package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.OtlpFlatten

/** OTLP/HTTP JSON ingestion shim — the receiving end of the reference's
  * OTLP receiver (glassflow-api/internal/otlp-receiver/server/; SURVEY.md
  * S3 scopes the gRPC server out and keeps an ingestion shim that lands
  * OTLP into the engine). Accepts the standard OTLP/HTTP JSON encoding:
  *
  *   POST /v1/logs     ExportLogsServiceRequest
  *   POST /v1/traces   ExportTraceServiceRequest
  *   POST /v1/metrics  ExportMetricsServiceRequest
  *
  * Each request is flattened by the F4–F6 operators and appended to a
  * parquet spool (`spoolDir/{logs|traces|metrics}`) that a streaming
  * pipeline reads as a file source — the Kafka-less analogue of the
  * reference's receiver→NATS hop. The response is the OTLP partial-success
  * envelope. A custom `route` replaces the spool write (e.g. a Kafka
  * producer in production).
  *
  * TRANSPORT: OTLP/HTTP with BOTH standard encodings — protobuf
  * (`Content-Type: application/x-protobuf`, the collector's `otlphttp`
  * default, decoded by [[OtlpProto]]) and JSON — plus the reference's
  * primary transport, OTLP/gRPC over h2c, via [[grpc]] /
  * [[OtlpGrpcServer]] on its own port. See README for collector snippets.
  */
final class OtlpReceiver(spark: SparkSession, spoolDir: String,
                         route: Option[(String, DataFrame) => Unit] = None) {

  private var server: HttpServer = _

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/v1/logs", handle("logs", OtlpFlatten.logs) _)
    server.createContext("/v1/traces", handle("traces", OtlpFlatten.traces) _)
    server.createContext("/v1/metrics", handle("metrics", OtlpFlatten.metrics) _)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  /** Decode + flatten + deliver a binary-protobuf Export*ServiceRequest —
    * the shared ingestion path behind both the HTTP protobuf content-type
    * and the gRPC transport ([[OtlpGrpcServer]]). Returns accepted rows
    * (−1 when a custom route owns counting). */
  def ingestProtobuf(signal: String, bytes: Array[Byte]): Long = {
    val flatten: DataFrame => DataFrame = signal match {
      case "logs" => OtlpFlatten.logs
      case "traces" => OtlpFlatten.traces
      case "metrics" => OtlpFlatten.metrics
      case other => throw new IllegalArgumentException(s"unknown OTLP signal: $other")
    }
    import spark.implicits._
    val df = spark.read.json(Seq(OtlpProto.toJson(signal, bytes)).toDS)
    deliver(signal, flatten(df))
  }

  /** A gRPC (OTLP's default transport) front for this receiver — start it
    * on its own port alongside [[start]]. */
  def grpc(): OtlpGrpcServer = new OtlpGrpcServer(ingestProtobuf)

  /** Deliver the flattened frame, evaluating the plan ONCE: the spool path
    * counts the files it just wrote (cheap metadata read) instead of
    * running the flatten twice (count + write); custom routes report the
    * row count themselves if they care — the acceptance envelope then
    * reports rows as unknown (-1 suppressed to plain success). */
  private def deliver(signal: String, flat: DataFrame): Long =
    route match {
      case Some(r) => r(signal, flat); -1L
      case None =>
        val dir = s"$spoolDir/$signal"
        val before = spoolRows(dir)
        flat.write.mode("append").parquet(dir)
        spoolRows(dir) - before
    }

  /** Total spool row count from parquet FILE METADATA (footer row counts —
    * no data scan). */
  private def spoolRows(dir: String): Long =
    try spark.read.parquet(dir).count() catch { case _: Exception => 0L }

  private def handle(signal: String, flatten: DataFrame => DataFrame)(ex: HttpExchange): Unit = {
    val status -> bodyJson =
      try {
        if (ex.getRequestMethod != "POST") 405 -> """{"error":"POST required"}"""
        else {
          val raw0 = ex.getRequestBody.readAllBytes()
          // collectors compress by default (otlphttp compression: gzip)
          val raw =
            if (Option(ex.getRequestHeaders.getFirst("Content-Encoding")).exists(_.contains("gzip"))) {
              val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw0))
              try in.readAllBytes() finally in.close()
            } else raw0
          val contentType = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
          // collectors default to protobuf on otlphttp; JSON also accepted
          val body =
            if (contentType.contains("protobuf")) OtlpProto.toJson(signal, raw)
            else new String(raw, StandardCharsets.UTF_8)
          import spark.implicits._
          val df = spark.read.json(Seq(body).toDS)
          val n = deliver(signal, flatten(df))
          // OTLP/HTTP success envelope (empty partialSuccess = all accepted)
          200 -> (if (n >= 0) s"""{"partialSuccess":{},"acceptedRows":$n}"""
                  else """{"partialSuccess":{}}""")
        }
      } catch {
        case e: Exception =>
          val msg = Option(e.getMessage).getOrElse(e.toString)
            .replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ").take(300)
          400 -> s"""{"error":"$msg"}"""
      }
    val bytes = bodyJson.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
