package graft.pipeline

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper, PropertyNamingStrategies}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Pipeline configuration — the engine's "query language". Mirrors the
  * reference's v3 pipeline JSON (glassflow-api/internal/api/pipeline.go:
  * 200-330; internal model internal/models/configs.go:462-479): sources with
  * declared schemas and per-topic dedup, a filter / stateless-transform
  * chain, an optional 2-way temporal join, and a ClickHouse sink mapping.
  * JSON is snake_case, e.g.:
  *
  * {{{
  * { "pipeline_id": "p1",
  *   "source": { "topics": [ { "name": "events",
  *       "schema_fields": [{"name":"id","type":"string"}],
  *       "deduplication": {"enabled":true,"id_field":"id","time_window":"1h","time_field":"ts"} } ] },
  *   "filter": { "expression": "status != 'failed'" },
  *   "transform": { "rules": [ {"expression":"upper(id)","output_name":"id","output_type":"string"} ] },
  *   "join": { "enabled": true, "sources": [
  *       {"source_id":"orders","join_key":"user_id","time_window":"1h","orientation":"left"},
  *       {"source_id":"users","join_key":"id","time_window":"1h","orientation":"right"} ],
  *     "projections": [ {"source_id":"orders","field":"order_id","output_name":"order_id"} ] },
  *   "sink": { "database":"default", "table":"out",
  *     "table_mapping": [ {"field_name":"id","column_name":"id","column_type":"String"} ],
  *     "max_batch_size": 100000, "max_delay_seconds": 60 } }
  * }}}
  */
final case class PipelineConfig(
  pipelineId: String,
  source: SourceConfig,
  filter: Option[FilterConfig] = None,
  transform: Option[TransformConfig] = None,
  join: Option[JoinConfig] = None,
  sink: Option[SinkConfig] = None,
  name: Option[String] = None,
  metadata: Map[String, String] = Map.empty)

final case class SourceConfig(
  kind: Option[String] = None,                 // "kafka" (default)
  brokers: Option[Seq[String]] = None,
  topics: Seq[TopicConfig] = Nil)

final case class TopicConfig(
  name: String,
  consumerGroup: Option[String] = None,
  schemaFields: Seq[FieldDef] = Nil,
  deduplication: Option[DedupConfig] = None)

final case class FieldDef(name: String, `type`: String)

final case class DedupConfig(
  enabled: Boolean = true,
  idField: String,
  timeWindow: String = "1h",                   // supports s/m/h/d suffix (configs.go:573-592)
  timeField: Option[String] = None)            // event-time column; None → exact dedup

final case class FilterConfig(expression: String)

final case class TransformConfig(rules: Seq[TransformRule])
final case class TransformRule(expression: String, outputName: String, outputType: String)

final case class JoinConfig(
  enabled: Boolean = true,
  sources: Seq[JoinSource] = Nil,
  projections: Seq[JoinProjection] = Nil)
final case class JoinSource(
  sourceId: String, joinKey: String, timeWindow: String = "1h",
  orientation: String, timeField: Option[String] = None)
final case class JoinProjection(sourceId: String, field: String, outputName: String)

final case class SinkConfig(
  database: String = "default",
  table: String,
  url: Option[String] = None,
  username: Option[String] = None,
  password: Option[String] = None,
  tableMapping: Seq[SinkMapping] = Nil,
  maxBatchSize: Option[Long] = None,
  maxDelaySeconds: Option[Int] = None)
final case class SinkMapping(
  sourceId: Option[String] = None, fieldName: String, columnName: String, columnType: String)

object PipelineConfig {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.setPropertyNamingStrategy(PropertyNamingStrategies.SNAKE_CASE)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def fromJson(json: String): PipelineConfig =
    mapper.readValue(json, classOf[PipelineConfig])

  def toJson(cfg: PipelineConfig): String = mapper.writeValueAsString(cfg)

  /** Resources sidecar round-trip (durable store keeps patched component
    * resources next to the config, in a `.resources.json` file). */
  def resourcesToJson(rs: Map[String, PipelineService.Resources]): String =
    mapper.writeValueAsString(rs)

  def resourcesFromJson(json: String): Map[String, PipelineService.Resources] =
    mapper.readValue(json,
      new com.fasterxml.jackson.core.`type`.TypeReference[Map[String, PipelineService.Resources]] {})

  /** "90s" | "30m" | "2h" | "7d" → milliseconds (reference accepts the d
    * suffix up to 7d, models/configs.go:573-592). */
  def windowMillis(s: String): Long = {
    val t = s.trim
    val (num, unit) = t.span(c => c.isDigit || c == '.')
    require(num.nonEmpty, s"bad window: $s")
    val base = num.toDouble
    val ms = unit match {
      case "ms" => base
      case "s" | "" => base * 1000
      case "m" => base * 60000
      case "h" => base * 3600000
      case "d" => base * 86400000
      case other => throw new IllegalArgumentException(s"bad window unit: $other in $s")
    }
    ms.toLong
  }

  /** Control-plane validation, mirroring the constructor checks in
    * models/configs.go:155-237,275-326: join needs exactly 2 sources with
    * distinct orientations; expressions and sink mappings must compile. */
  def validate(cfg: PipelineConfig, schemas: Map[String, org.apache.spark.sql.types.StructType]): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (cfg.pipelineId.isEmpty) errs += "pipeline_id must be non-empty"
    // the id names checkpoint dirs, DLQ queues, and store files — keep it
    // to a filesystem- and URL-safe charset
    else if (!cfg.pipelineId.matches("[A-Za-z0-9][A-Za-z0-9._-]*"))
      errs += "pipeline_id must match [A-Za-z0-9][A-Za-z0-9._-]*"
    if (cfg.source.topics.isEmpty) errs += "source: at least one topic required"
    cfg.join.filter(_.enabled).foreach { j =>
      if (j.sources.length != 2) errs += "join: exactly 2 sources required"
      else if (j.sources.map(_.orientation).sorted != Seq("left", "right"))
        errs += "join: orientations must be left and right"
    }
    cfg.filter.foreach { f =>
      schemas.values.headOption.foreach { sch =>
        graft.exprs.ExprCompiler.validate(f.expression, sch).left
          .foreach(e => errs += s"filter: $e")
      }
    }
    cfg.sink.foreach { s =>
      s.tableMapping.foreach { m =>
        if (!graft.types.CHType.isSupported(m.columnType))
          errs += s"sink: unsupported column type ${m.columnType}"
      }
    }
    errs.result()
  }
}
