package graft.sources.kafka

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.{JsonIngest, SchemaRegistry}
import MiniKafkaBroker.Cluster

/** Replays the reference's multi-schema ingestor feature
  * (glassflow-api/tests/features/ingestor/ingestor_schema_check.feature)
  * over the real wire path: Confluent wire-format-framed events
  * (`0x00` + uint32 schema id + JSON) appended to [[MiniKafkaBroker]],
  * read by `format("graft-kafka")`, the prefix split by
  * [[JsonIngest.stripSchemaRegistryPrefix]], each event validated against
  * ITS OWN registry schema, the version id surfaced on every output row
  * (the reference's NATS-Schema-Version-Id header).
  *
  * Deviation, by design: on an unknown/absent schema id the reference
  * PARKS the message (results lag 1) and raises a pipeline signal — a
  * NATS-redelivery concept; here those rows route to the DLQ envelope
  * instead, because a micro-batch pipeline must not head-of-line-block a
  * partition on one bad message (same at-least-once outcome, no stall). */
class SchemaCheckFeatureSpec extends SparkSpec {

  private val fieldsV1101 = Seq("event_id" -> "string", "user_id" -> "string")
  private val fieldsV1102 = Seq("event_id" -> "string", "user_id" -> "string",
    "email" -> "string")

  private def structOf(fields: Seq[(String, String)]): StructType =
    graft.types.EngineSchema.structFor(fields)

  /** Confluent wire format: magic 0x00, uint32 BE schema id, payload. */
  private def framed(id: Int, json: String): Array[Byte] = {
    val payload = json.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](5 + payload.length)
    out(1) = (id >> 24).toByte; out(2) = (id >> 16).toByte
    out(3) = (id >> 8).toByte; out(4) = id.toByte
    System.arraycopy(payload, 0, out, 5, payload.length)
    out
  }

  /** Drive framed `events` (schemaId → json; schemaId < 0 = unframed)
    * through strip → per-version validate → union. Returns
    * (version, event_id, user_id) results and DLQ (error, original). */
  private def runSchemaRouted(events: Seq[(Int, String)], dedup: Boolean):
      (Seq[(Long, String, String)], Seq[(String, String)]) = {
    val store = new SchemaRegistry.VersionStore(SchemaRegistry.client(
      SchemaRegistry.Config("http://registry.invalid"),
      _ => Left("no live registry in this scenario")))
    store.register(1101L, fieldsV1101)
    store.register(1102L, fieldsV1102)

    val c = new Cluster()
    val b = c.addBroker()
    c.addPartition("t", 0)
    val recs = events.zipWithIndex.map { case ((id, json), i) =>
      val bytes = if (id < 0) json.getBytes(StandardCharsets.UTF_8) else framed(id, json)
      Records.Record(i.toLong, 1700000000000L + i,
        s"k$i".getBytes(StandardCharsets.UTF_8), bytes)
    }
    c.appendRaw("t", 0, 0, recs.size - 1L, Records.encodeBatch(0L, recs))

    val results = new ConcurrentLinkedQueue[(Long, String, String)]
    val dlqOut = new ConcurrentLinkedQueue[(String, String)]
    try {
      val src = spark.readStream.format("graft-kafka")
        .option("brokers", b.address).option("topic", "t").load()
      val (payload, schemaId) = JsonIngest.stripSchemaRegistryPrefix(col("value"))
      val stripped = src.select(payload.as("payload"), schemaId.as("schema_id"),
        col("timestamp"))

      // per-version branch: validate ONLY rows carrying that id against
      // that id's registry schema — one from_json per declared version,
      // matching the reference's validate-by-message-schema
      def branch(id: Long): DataFrame = {
        val schema = structOf(store.accept(id).toOption.get)
        val (good, _) = JsonIngest.ingest(
          stripped.filter(col("schema_id") === id), "payload", schema,
          keep = Seq("schema_id", "timestamp"))
        good.select(col("schema_id"), col("event_id"), col("user_id"),
          col("timestamp"))
      }
      val known = store.knownVersions.toSeq.sorted
      val unioned = known.map(branch).reduce(_.unionByName(_))
      val out = if (dedup)
        graft.operators.DedupOp.windowedStreaming(
          Seq("event_id"), "timestamp", "30 seconds")(unioned)
      else unioned

      // absent id (unframed) or an id the registry does not know → DLQ
      val bad = stripped.filter(col("schema_id").isNull ||
          !col("schema_id").isin(known: _*))
        .select(col("payload"),
          when(col("schema_id").isNull,
            lit("failed to parse schema ID from message"))
            .otherwise(concat(lit("unknown schema version "), col("schema_id")))
            .as("why"))

      val q1 = out.writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(r =>
            results.add((r.getLong(0), r.getString(1), r.getString(2))))
        }.start()
      val q2 = bad.writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(r => dlqOut.add((r.getString(1), r.getString(0))))
        }.start()
      try { q1.processAllAvailable(); q2.processAllAvailable() }
      finally { q1.stop(); q2.stop() }
    } finally c.stop()
    (results.asScala.toSeq, dlqOut.asScala.toSeq)
  }

  test("ingestor_schema_check.feature: different schemas from registry") {
    val (rows, dlq) = runSchemaRouted(Seq(
      1101 -> """{"event_id": "123", "user_id": "John Doe"}""",
      1101 -> """{"event_id": "456", "user_id": "Jane Smith"}""",
      1102 -> """{"event_id": "789", "user_id": "Bob Johnson"}""",
      1102 -> """{"event_id": "789", "user_id": "Ulm Petterson"}"""), dedup = false)
    assert(rows.toSet == Set(
      (1101L, "123", "John Doe"), (1101L, "456", "Jane Smith"),
      (1102L, "789", "Bob Johnson"), (1102L, "789", "Ulm Petterson")))
    assert(dlq.isEmpty)
  }

  test("ingestor_schema_check.feature: multiple schemas with deduplication") {
    val (rows, _) = runSchemaRouted(Seq(
      1101 -> """{"event_id": "123", "user_id": "John Doe"}""",
      1101 -> """{"event_id": "456", "user_id": "Jane Smith"}""",
      1102 -> """{"event_id": "789", "user_id": "Bob Johnson"}""",
      1102 -> """{"event_id": "789", "user_id": "Ulm Petterson"}"""), dedup = true)
    assert(rows.toSet == Set(
      (1101L, "123", "John Doe"), (1101L, "456", "Jane Smith"),
      (1102L, "789", "Bob Johnson")))
    assert(rows.size == 3, "cross-version dedup on event_id keeps the first 789")
  }

  test("ingestor_schema_check.feature: absent and unknown schema ids route to DLQ") {
    val (rows, dlq) = runSchemaRouted(Seq(
      -1 -> """{"event_id": "000", "user_id": "user name"}""", // unframed
      1101 -> """{"event_id": "123", "user_id": "John Doe"}""",
      1101 -> """{"event_id": "456", "user_id": "Jane Smith"}""",
      1102 -> """{"event_id": "789", "user_id": "Bob Johnson"}""",
      1103 -> """{"event_id": "789", "user_id": "Ulm Petterson"}"""), dedup = false)
    assert(rows.toSet == Set(
      (1101L, "123", "John Doe"), (1101L, "456", "Jane Smith"),
      (1102L, "789", "Bob Johnson")))
    assert(dlq.size == 2)
    val byWhy = dlq.toMap
    assert(byWhy.keySet == Set("failed to parse schema ID from message",
      "unknown schema version 1103"))
    assert(byWhy("failed to parse schema ID from message").contains("\"000\""))
  }
}
