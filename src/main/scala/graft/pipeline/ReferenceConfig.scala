package graft.pipeline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Adapter from the reference's PUBLIC pipeline-config JSON — the exact
  * files its users run today — to the engine's native [[PipelineConfig]].
  *
  * Two wire shapes exist in the reference and its demos:
  *  - **v3** (api/pipeline.go:200-330; every `demos/ * /glassflow*` v3
  *    file): a `sources` array (kafka entries carry `topic`,
  *    `connection_params`, `schema_fields`; OTLP entries just
  *    `type`/`source_id`), an ordered `transforms` array of typed entries
  *    (`filter` / `dedup` / `stateless`), a `join` with
  *    `left_source`/`right_source`/`output_fields` (the migrate-preview
  *    emission spells it `sources`/`output_fields{field,output_name}` —
  *    both are accepted), and a sink whose column list is `mapping`
  *    (`table_mapping` also accepted) with `max_delay_time` as a duration
  *    string.
  *  - **v2** (`demos/observability`): a single `source` with `topics`,
  *    a top-level `schema.fields` list carrying BOTH the engine type and
  *    the sink column name/type per source, and a flat sink.
  *
  * [[fromJson]] sniffs the shape and normalizes; the native snake_case
  * form parsed by [[PipelineConfig.fromJson]] passes through unchanged, so
  * one entry point accepts all three. */
object ReferenceConfig {

  private val mapper = new ObjectMapper()

  def fromJson(json: String): PipelineConfig = {
    val root = mapper.readTree(json)
    val src = root.path("source")
    // the native shape also spells `source.topics`; v2 is recognized by its
    // own markers (source.type / connection_params, or the top-level
    // schema.fields list) so native configs never detour through the adapter
    val isV2 = src.has("topics") &&
      (root.has("schema") || src.has("type") || src.has("connection_params"))
    if (root.has("sources")) fromV3(root)
    else if (isV2) fromV2(root)
    else PipelineConfig.fromJson(json) // native shape
  }

  private def textOpt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  private def elems(n: JsonNode): Seq[JsonNode] =
    if (n == null || !n.isArray) Nil else n.elements().asScala.toSeq

  private def fields(n: JsonNode, name: String): Seq[FieldDef] =
    elems(n.path(name)).map(f => FieldDef(f.path("name").asText, f.path("type").asText))

  /** "10s"/"1m" → seconds; bare numbers pass through. */
  private def delaySeconds(n: JsonNode): Option[Int] =
    Option(n.get("max_delay_time")).filterNot(_.isNull).map { d =>
      if (d.isNumber) d.asInt
      else (PipelineConfig.windowMillis(d.asText) / 1000L).toInt
    }

  private def metadata(root: JsonNode): Map[String, String] =
    Option(root.get("metadata")).filterNot(_.isNull).map { m =>
      m.properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> (if (v.isValueNode) v.asText else v.toString)
      }.toMap
    }.getOrElse(Map.empty)

  private def sinkOf(n: JsonNode, mappings: Seq[SinkMapping]): Option[SinkConfig] =
    Option(n).filterNot(_ == null).filter(_.isObject).map { s =>
      val conn = s.path("connection_params")
      SinkConfig(
        database = textOpt(conn, "database").orElse(textOpt(s, "database")).getOrElse("default"),
        table = textOpt(s, "table").getOrElse(""),
        username = textOpt(conn, "username").orElse(textOpt(s, "username")),
        password = textOpt(conn, "password").orElse(textOpt(s, "password")),
        tableMapping = mappings,
        maxBatchSize = Option(s.get("max_batch_size")).filterNot(_.isNull).map(_.asLong),
        maxDelaySeconds = delaySeconds(s))
    }

  private def v3Mappings(sink: JsonNode): Seq[SinkMapping] = {
    val list = if (sink.has("mapping")) sink.path("mapping") else sink.path("table_mapping")
    elems(list).map { m =>
      SinkMapping(
        sourceId = textOpt(m, "source_id"),
        fieldName = textOpt(m, "name").orElse(textOpt(m, "field_name")).getOrElse(""),
        columnName = m.path("column_name").asText,
        columnType = m.path("column_type").asText)
    }
  }

  private def fromV3(root: JsonNode): PipelineConfig = {
    val sources = elems(root.path("sources"))
    val kind = sources.headOption.flatMap(textOpt(_, "type"))
    val brokers = sources.flatMap(s => elems(s.path("connection_params").path("brokers"))
      .map(_.asText)).distinct

    // transforms: dedup attaches to its source's topic; filter/stateless
    // keep the reference's chain position (filter → dedup → transform)
    val transforms = elems(root.path("transforms"))
    val dedupBySource: Map[String, DedupConfig] = transforms
      .filter(_.path("type").asText == "dedup")
      .flatMap { t =>
        val c = t.path("config")
        textOpt(c, "key").map { key =>
          t.path("source_id").asText -> DedupConfig(
            enabled = true, idField = key,
            timeWindow = textOpt(c, "time_window").getOrElse("1h"),
            timeField = textOpt(c, "time_field"))
        }
      }.toMap

    val topics = sources.map { s =>
      val id = textOpt(s, "source_id").getOrElse(s.path("topic").asText)
      TopicConfig(
        name = textOpt(s, "topic").getOrElse(id),
        schemaFields = fields(s, "schema_fields"),
        deduplication = dedupBySource.get(id)
          .orElse(dedupBySource.get(textOpt(s, "topic").getOrElse(id))))
    }

    val filter = transforms.find(_.path("type").asText == "filter")
      .flatMap(t => textOpt(t.path("config"), "expression")).map(FilterConfig(_))
    val stateless = transforms.find(t =>
        Seq("stateless", "stateless_transform").contains(t.path("type").asText))
      .map { t =>
        TransformConfig(elems(t.path("config").path("transforms")).map(r => TransformRule(
          expression = r.path("expression").asText,
          outputName = r.path("output_name").asText,
          outputType = r.path("output_type").asText)))
      }

    val join = Option(root.get("join")).filterNot(_.isNull).filter(_.isObject)
      .filter(j => !j.has("enabled") || j.path("enabled").asBoolean(true))
      .map { j =>
        val srcs =
          if (j.has("left_source") || j.has("right_source"))
            Seq("left" -> j.path("left_source"), "right" -> j.path("right_source")).map {
              case (orient, s) => JoinSource(
                sourceId = s.path("source_id").asText,
                joinKey = textOpt(s, "key").orElse(textOpt(s, "join_key")).getOrElse(""),
                timeWindow = textOpt(s, "time_window").getOrElse("1h"),
                orientation = orient,
                timeField = textOpt(s, "time_field"))
            }
          else elems(j.path("sources")).map(s => JoinSource(
            sourceId = s.path("source_id").asText,
            joinKey = textOpt(s, "join_key").orElse(textOpt(s, "key")).getOrElse(""),
            timeWindow = textOpt(s, "time_window").getOrElse("1h"),
            orientation = s.path("orientation").asText,
            timeField = textOpt(s, "time_field")))
        JoinConfig(enabled = true, sources = srcs,
          projections = elems(j.path("output_fields")).map { f =>
            val field = textOpt(f, "name").orElse(textOpt(f, "field")).getOrElse("")
            JoinProjection(f.path("source_id").asText, field,
              textOpt(f, "output_name").getOrElse(field))
          })
      }

    PipelineConfig(
      pipelineId = root.path("pipeline_id").asText,
      source = SourceConfig(kind = kind,
        brokers = if (brokers.isEmpty) None else Some(brokers), topics = topics),
      filter = filter,
      transform = stateless,
      join = join,
      sink = sinkOf(root.get("sink"), v3Mappings(root.path("sink"))),
      name = textOpt(root, "name"),
      metadata = metadata(root))
  }

  private def fromV2(root: JsonNode): PipelineConfig = {
    val src = root.path("source")
    // v2 keeps engine type AND sink column per field in one top-level list
    val schemaFields = elems(root.path("schema").path("fields"))
    val topics = elems(src.path("topics")).map { t =>
      val id = textOpt(t, "id").orElse(textOpt(t, "name")).getOrElse("")
      val dedup = Option(t.get("deduplication")).filterNot(_.isNull)
        .filter(_.path("enabled").asBoolean(false))
        .flatMap(d => textOpt(d, "id_field").map(key => DedupConfig(
          enabled = true, idField = key,
          timeWindow = textOpt(d, "time_window").getOrElse("1h"),
          timeField = textOpt(d, "time_field"))))
      TopicConfig(
        name = textOpt(t, "name").getOrElse(id),
        schemaFields = schemaFields
          .filter(f => textOpt(f, "source_id").forall(_ == id))
          .map(f => FieldDef(f.path("name").asText, f.path("type").asText)),
        deduplication = dedup)
    }
    val mappings = schemaFields.filter(_.has("column_name")).map(f => SinkMapping(
      sourceId = textOpt(f, "source_id"),
      fieldName = f.path("name").asText,
      columnName = f.path("column_name").asText,
      columnType = f.path("column_type").asText))
    PipelineConfig(
      pipelineId = root.path("pipeline_id").asText,
      source = SourceConfig(
        kind = textOpt(src, "type"),
        brokers = Some(elems(src.path("connection_params").path("brokers")).map(_.asText))
          .filter(_.nonEmpty),
        topics = topics),
      sink = sinkOf(root.get("sink"), mappings),
      name = textOpt(root, "name"),
      metadata = metadata(root))
  }
}
