package graft.sources.kafka

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.DedupOp
import graft.sources.JsonIngest
import MiniKafkaBroker.Cluster

/** Replays the reference's ingestor BDD feature
  * (glassflow-api/tests/features/ingestor/ingestor.feature) with the REAL
  * front door: events appended to [[MiniKafkaBroker]] → read over the wire
  * by `format("graft-kafka")` → JsonIngest validate/split → windowed dedup
  * on the Kafka record timestamp → results vs the feature's own tables.
  * This is the full reference ingest path (consumer → processor → stream)
  * as one streaming query, sockets included. */
class IngestorFeatureSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  /** (results, dlqRaw) collectors after draining the query over `events`
    * per partition. `dedup` mirrors the feature's deduplication toggle. */
  private def runIngestor(events: Seq[(Int, String, String)], dedup: Boolean,
                          partitions: Int = 1,
                          afterFirstDrain: Option[(Cluster, () => Unit) => Unit] = None):
      (Seq[(String, String)], Seq[String]) = {
    val c = new Cluster()
    val b = c.addBroker()
    (0 until partitions).foreach(p => c.addPartition("t", p))
    events.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (p, evs) =>
      c.append("t", p, evs.map { case (_, k, v) => k -> v })
    }
    val results = new ConcurrentLinkedQueue[(String, String)]
    val dlqRaw = new ConcurrentLinkedQueue[String]
    try {
      val src = spark.readStream.format("graft-kafka")
        .option("brokers", b.address).option("topic", "t").load()
        .selectExpr("cast(value as string) as value", "timestamp")
      val (good, dlq) = JsonIngest.ingest(src, "value", schema, keep = Seq("timestamp"))
      // the feature's dedup config: id_field=id, time_window=1h, no time
      // field → the Kafka record timestamp is the arrival time
      val out = (if (dedup) DedupOp.windowedStreaming(Seq("id"), "timestamp", "1 hour")(good)
                 else good).drop("timestamp")
      val dlqEnv = graft.sink.Dlq.envelope("ingestor",
        "failed to validate data: message does not match the declared schema")(
        dlq.withColumnRenamed("__raw", "raw").drop("timestamp"))
      val q1 = out.writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(r => results.add((r.getString(0), r.getString(1))))
        }.start()
      val q2 = dlqEnv.writeStream.outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach { r =>
            assert(r.getAs[String]("component") == "ingestor")
            assert(r.getAs[String]("error").contains("validate"))
            dlqRaw.add(r.getAs[String]("original_message"))
          }
        }.start()
      val drain = () => { q1.processAllAvailable(); q2.processAllAvailable() }
      try {
        drain()
        afterFirstDrain.foreach(f => f(c, drain))
      } finally { q1.stop(); q2.stop() }
    } finally c.stop()
    (results.asScala.toSeq, dlqRaw.asScala.toSeq)
  }

  test("ingestor.feature: Kafka Ingestor with deduplication") {
    val (rows, dlq) = runIngestor(Seq(
      (0, "1", """{"id": "123", "name": "John Doe"}"""),
      (0, "2", """{"id": "456", "name": "Jane Smith"}"""),
      (0, "3", """{"id": "789", "name": "Bob Johnson"}"""),
      (0, "4", """{"id": "789", "name": "Ulm Petterson"}""")), dedup = true)
    assert(rows.toSet == Set("123" -> "John Doe", "456" -> "Jane Smith",
      "789" -> "Bob Johnson"))
    assert(rows.size == 3, "the duplicate id 789 must be dropped, first kept")
    assert(dlq.isEmpty)
  }

  test("ingestor.feature: Kafka Ingestor without deduplication") {
    val (rows, _) = runIngestor(Seq(
      (0, "1", """{"id": "123", "name": "Sir Paul"}"""),
      (0, "2", """{"id": "456", "name": "Judy Smith"}"""),
      (0, "3", """{"id": "789", "name": "Bob Bishop"}"""),
      (0, "4", """{"id": "789", "name": "Uliana Gromova"}""")), dedup = false)
    assert(rows.size == 4, "without dedup both id-789 events flow through")
    assert(rows.count(_._1 == "789") == 2)
  }

  test("ingestor.feature: deduplication across multiple partitions") {
    val (rows, _) = runIngestor(Seq(
      (0, "1", """{"id": "123", "name":"Max Wilson"}"""),
      (1, "2", """{"id": "456", "name":"Pete Roller"}"""),
      (2, "3", """{"id": "789", "name":"Fedor Smolov"}"""),
      (0, "4", """{"id": "789", "name":"Fedor Smolov"}""")),
      dedup = true, partitions = 3)
    assert(rows.toSet == Set("123" -> "Max Wilson", "456" -> "Pete Roller",
      "789" -> "Fedor Smolov"))
    assert(rows.size == 3, "dedup state is keyed, not per-partition: the " +
      "cross-partition duplicate must collapse")
  }

  test("ingestor.feature: Kafka Ingestor with validation (bad row → DLQ)") {
    val (rows, dlq) = runIngestor(Seq(
      (0, "1", """{"id": "123", "name": "Alice"}"""),
      (0, "2", """{"id": "456", "name": "Bob"}"""),
      (0, "3", """{"key": "value"}""")), dedup = true)
    assert(rows.toSet == Set("123" -> "Alice", "456" -> "Bob"))
    assert(dlq.size == 1)
    // envelope wraps the raw payload whole (reference original_message)
    assert(dlq.head.contains(""""key\": \"value"""") ||
      dlq.head.contains("""key"""), dlq.head)
  }

  test("ingestor.feature: Check deduplication within 2 batches") {
    val (rows, _) = runIngestor(Seq(
      (0, "1", """{"id": "123", "name": "John Doe"}"""),
      (0, "2", """{"id": "456", "name": "Jane Smith"}"""),
      (0, "3", """{"id": "123", "name": "Johnny Doe"}"""),
      (0, "4", """{"id": "789", "name": "Bob Johnson"}"""),
      (0, "5", """{"id": "456", "name": "Janet Smith"}""")),
      dedup = true,
      afterFirstDrain = Some { (c, drain) =>
        // second batch lands while the query is live; ids seen in batch 1
        // stay suppressed, the in-batch duplicate (101) collapses too
        c.append("t", 0, Seq(
          "6" -> """{"id": "101", "name": "Robert Johnson"}""",
          "7" -> """{"id": "111", "name": "Alice Brown"}""",
          "8" -> """{"id": "101", "name": "Johnny Doe"}"""))
        drain()
      })
    assert(rows.toSet == Set("123" -> "John Doe", "456" -> "Jane Smith",
      "789" -> "Bob Johnson", "101" -> "Robert Johnson", "111" -> "Alice Brown"))
    assert(rows.size == 5)
  }
}
