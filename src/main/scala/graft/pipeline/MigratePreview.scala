package graft.pipeline

/** v2 → v3 pipeline-config migration preview — a PURE transformation, no
  * pipeline is created (reference internal/api/migrate_preview.go:17-58).
  *
  * The engine's native config ([[PipelineConfig]]) mirrors the reference's
  * v2 shape (per-topic dedup blocks, top-level filter/transform). The v3
  * shape normalizes that into a `sources` list plus an ordered `transforms`
  * list of typed entries (`dedup` / `filter` / `stateless`,
  * api/pipeline.go:247-249), in the reference's emission order: per-topic
  * dedups first, then filter, then stateless (migrate_preview.go
  * convertTransforms).
  */
object MigratePreview {

  def toV3(cfg: PipelineConfig): Map[String, Any] = {
    val sources = cfg.source.topics.map { t =>
      Map[String, Any](
        "type" -> cfg.source.kind.getOrElse("kafka"),
        "source_id" -> t.name,
        "topic" -> t.name,
        "schema_fields" -> t.schemaFields.map(f =>
          Map("name" -> f.name, "type" -> f.`type`))) ++
        cfg.source.brokers.map(b =>
          Map[String, Any]("connection_params" -> Map("brokers" -> b))).getOrElse(Map.empty)
    }

    val dedups = cfg.source.topics.flatMap { t =>
      t.deduplication.filter(_.enabled).map { d =>
        Map[String, Any]("type" -> "dedup", "source_id" -> t.name,
          "config" -> (Map[String, Any](
            "key" -> d.idField, "time_window" -> d.timeWindow) ++
            d.timeField.map("time_field" -> _).toMap))
      }
    }
    val firstSource = cfg.source.topics.headOption.map(_.name).getOrElse("")
    val filter = cfg.filter.map(f =>
      Map[String, Any]("type" -> "filter", "source_id" -> firstSource,
        "config" -> Map("expression" -> f.expression))).toSeq
    val stateless = cfg.transform.map(tr =>
      Map[String, Any]("type" -> "stateless", "source_id" -> firstSource,
        "config" -> Map("transforms" -> tr.rules.map(r => Map(
          "expression" -> r.expression,
          "output_name" -> r.outputName,
          "output_type" -> r.outputType))))).toSeq

    val join = cfg.join.filter(_.enabled).map { j =>
      Map[String, Any](
        "sources" -> j.sources.map(s => Map[String, Any](
          "source_id" -> s.sourceId, "join_key" -> s.joinKey,
          "time_window" -> s.timeWindow, "orientation" -> s.orientation)),
        "output_fields" -> j.projections.map(p => Map(
          "source_id" -> p.sourceId, "field" -> p.field,
          "output_name" -> p.outputName)))
    }

    val sink = cfg.sink.map { s =>
      Map[String, Any](
        "database" -> s.database, "table" -> s.table,
        "table_mapping" -> s.tableMapping.map(m => Map(
          "field_name" -> m.fieldName, "column_name" -> m.columnName,
          "column_type" -> m.columnType))) ++
        s.maxBatchSize.map("max_batch_size" -> _).toMap ++
        s.maxDelaySeconds.map("max_delay_time" -> _).toMap
    }

    Map[String, Any](
      "version" -> "v3",
      "pipeline_id" -> cfg.pipelineId,
      "name" -> cfg.name.getOrElse(cfg.pipelineId),
      "sources" -> sources,
      "transforms" -> (dedups ++ filter ++ stateless),
      "metadata" -> cfg.metadata) ++
      join.map("join" -> _).toMap ++
      sink.map("sink" -> _).toMap
  }
}
