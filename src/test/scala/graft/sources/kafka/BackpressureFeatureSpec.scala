package graft.sources.kafka

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.kafka.MiniKafkaBroker.Cluster

/** Replays glassflow-api/tests/features/backpressure/backpressure.feature
  * (3 scenarios) on the wire source. The reference's back-pressure loop
  * pauses Kafka consumption while the output NATS stream is at max-messages
  * and retries until it drains; the Spark analogue is ADMISSION CONTROL —
  * `maxOffsetsPerTrigger` bounds what each micro-batch admits (the
  * stream-full cap), deferred records stay in Kafka as consumer lag, and
  * the next trigger drains them. Same observable contract, same fixture
  * method: a real broker socket, real consumer offsets. */
class BackpressureFeatureSpec extends SparkSpec {

  private def withCluster(f: Cluster => Unit): Unit = {
    val c = new Cluster()
    c.addBroker()
    try f(c) finally c.stop()
  }
  private def brokers(c: Cluster): String = c.brokerList.map(_.address).mkString(",")
  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-bp-$tag").toString

  private def genEvents(n: Int): Seq[(String, String)] =
    (0 until n).map(i => (s"id$i", s"""{"id":"id$i","val":"v$i"}"""))

  test("backpressure.feature: Back-pressure is applied when the output stream is full") {
    withCluster { c =>
      c.addPartition("bp_topic_s1", 0)
      c.append("bp_topic_s1", 0, genEvents(200))
      val perBatch = new ConcurrentLinkedQueue[(Long, Int)]
      val q = spark.readStream.format("graft-kafka")
        .option("brokers", brokers(c)).option("topic", "bp_topic_s1")
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "50") // the output stream's max messages 50
        .load()
        .writeStream
        .option("checkpointLocation", tempDir("s1"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          perBatch.add((id, df.count().toInt)); ()
        }
        .start()
      q.awaitTermination(30000)
      val batches = perBatch.asScala.toSeq.sortBy(_._1)
      // "the output stream depth should be at most 50": no flush ever
      // carries more than the cap
      assert(batches.forall(_._2 <= 50),
        s"a micro-batch exceeded the stream-full cap: $batches")
      // "Kafka consumer lag should grow above 50": after the first trigger,
      // 150 of 200 records remain unconsumed
      val lagAfterFirst = 200 - batches.head._2
      assert(batches.head._2 == 50 && lagAfterFirst == 150)
      // "the back-pressure events metric should be greater than 0": the cap
      // engaged (admission deferred records) on every batch but the last
      val deferrals = batches.init.count(_._2 == 50)
      assert(deferrals > 0)
      assert(batches.map(_._2).sum == 200, "deferred records are lag, not loss")
    }
  }

  test("backpressure.feature: Ingestor recovers when back-pressure clears") {
    withCluster { c =>
      c.addPartition("bp_topic_s5", 0)
      c.append("bp_topic_s5", 0, genEvents(200))
      val seen = new ConcurrentLinkedQueue[String]
      // same capped stream; "draining the output stream" is the next
      // triggers running — AvailableNow keeps triggering until lag is 0
      val q = spark.readStream.format("graft-kafka")
        .option("brokers", brokers(c)).option("topic", "bp_topic_s5")
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "50")
        .load()
        .writeStream
        .option("checkpointLocation", tempDir("s5"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.selectExpr("cast(key as string)").collect()
            .foreach(r => seen.add(r.getString(0)))
        }
        .start()
      q.awaitTermination(45000) // the feature's own recovery bound
      // "Kafka consumer lag should return to 0": every record consumed,
      // exactly once
      assert(seen.size == 200)
      assert(seen.asScala.toSet == genEvents(200).map(_._1).toSet)
    }
  }

  test("backpressure.feature: Ingestor stops cleanly during back-pressure") {
    withCluster { c =>
      c.addPartition("bp_topic_s6", 0)
      c.append("bp_topic_s6", 0, genEvents(200))
      val ckpt = tempDir("s6")
      val seenOffsets = new ConcurrentLinkedQueue[Long]
      def start(trigger: Trigger) = spark.readStream.format("graft-kafka")
        .option("brokers", brokers(c)).option("topic", "bp_topic_s6")
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "50")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(trigger)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("offset").collect().foreach(r => seenOffsets.add(r.getLong(0)))
        }
        .start()
      // a slow trigger: after the first capped batch the query idles with
      // 150 records of lag — mid-back-pressure. Wait for the batch to
      // COMMIT (lastProgress is emitted after the offset log write), not
      // merely for foreachBatch to run: stopping in the window between
      // user code and the commit replays the batch on restart — correct
      // at-least-once behavior, but it would make the exact-count
      // assertion below racy.
      val q = start(Trigger.ProcessingTime("3600 seconds"))
      val deadline = System.nanoTime() + 20000000000L
      while (q.lastProgress == null && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seenOffsets.size == 50, "first capped batch committed")
      // "I can stop the ingestor within 15s" — stop while back-pressured
      val t0 = System.nanoTime()
      q.stop()
      val stopMs = (System.nanoTime() - t0) / 1000000
      assert(stopMs < 15000, s"stop took ${stopMs}ms")
      // a clean stop loses nothing: resume drains the remaining 150
      val q2 = start(Trigger.AvailableNow())
      q2.awaitTermination(30000)
      assert(seenOffsets.asScala.toSet.size == 200, "no loss after the stop")
      assert(seenOffsets.size == 200,
        "no duplicates: the stop landed after the commit, so nothing replays")
    }
  }
}
