package graft.sink

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec

/** Replays the reference's sink retry/DLQ BDD scenarios
  * (glassflow-api/tests/features/sink/retryable.feature, dlq.feature)
  * through [[ClickHouseSink.foreachBatchHandler]] — the exact handler
  * [[ClickHouseSink.attach]] installs. The "engine loop" below re-invokes
  * the handler with the same batchId while it rethrows, which is
  * precisely Spark's restart-the-batch-from-checkpoint behavior; the
  * writer seam injects ClickHouse server errors by code. */
class SinkFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(maxRetries: Int = 10) = ClickHouseSink.Config(
    url = "jdbc:ch://ch:8123", database = "default", table = "events_retry",
    username = "u", password = "p", mappings = Nil, maxRetries = maxRetries)

  private def events(n: Int): DataFrame =
    (1 to n).map(i => (s"e$i", s"name$i")).toDF("event_id", "name")

  private def chError(code: Int) =
    new java.sql.SQLException(s"Code: $code. DB::Exception: injected")

  /** Spark's micro-batch retry loop: re-run the failing batch (same id)
    * until the handler stops rethrowing; returns attempts used. */
  private def engineLoop(handler: (DataFrame, Long) => Unit, batch: DataFrame,
                         batchId: Long = 7L, maxLoops: Int = 50): Int = {
    var attempts = 0
    var done = false
    while (!done && attempts < maxLoops) {
      attempts += 1
      try { handler(batch, batchId); done = true }
      catch { case _: Throwable => () }
    }
    assert(done, s"handler still rethrowing after $maxLoops attempts")
    attempts
  }

  test("retryable.feature: Transient CH failure recovers without DLQ") {
    val table = new ConcurrentLinkedQueue[Row]
    val dlq = new ConcurrentLinkedQueue[Row]
    val calls = new AtomicInteger
    // "disrupt ClickHouse writes and schedule restore": first 2 INSERT
    // attempts fail with a retryable server code, then writes restore
    val handler = ClickHouseSink.foreachBatchHandler(cfg(), d => d.collect().foreach(dlq.add),
      write = Some { df =>
        if (calls.incrementAndGet() <= 2) throw chError(159) // TIMEOUT_EXCEEDED
        df.collect().foreach(table.add)
      })
    val attempts = engineLoop(handler, events(10))
    assert(table.size == 10, "all events land once the transient fault clears")
    assert(dlq.isEmpty, "a recovered batch must never dead-letter")
    assert(attempts == 3, "exactly the two disrupted attempts retried")
  }

  test("retryable.feature: Permanent error sends all events to DLQ with zero NACKs") {
    val dlq = new ConcurrentLinkedQueue[Row]
    val calls = new AtomicInteger
    val handler = ClickHouseSink.foreachBatchHandler(cfg(), d => d.collect().foreach(dlq.add),
      write = Some { _ => calls.incrementAndGet(); throw chError(6) }) // CANNOT_PARSE_TEXT
    handler(events(4), 1L) // must NOT throw: permanent → DLQ, stream continues
    assert(calls.get == 1, "zero NACKs: a permanent fault is never retried")
    assert(dlq.size == 4, "dlq should contain 4 events (the feature's own assertion)")
    val env = dlq.asScala.head
    assert(env.getAs[String]("component") == "sink")
    assert(env.getAs[String]("error").contains("Code: 6"))
  }

  test("retryable.feature: Persistent retryable failure dead-letters after MaxDeliver") {
    val dlq = new ConcurrentLinkedQueue[Row]
    val calls = new AtomicInteger
    val handler = ClickHouseSink.foreachBatchHandler(cfg(maxRetries = 10),
      d => d.collect().foreach(dlq.add),
      write = Some { _ => calls.incrementAndGet(); throw chError(242) }) // TABLE_IS_READ_ONLY
    val attempts = engineLoop(handler, events(5))
    assert(attempts == 10, "the NATS MaxDeliver analogue: budget of 10 attempts")
    assert(calls.get == 10)
    assert(dlq.size == 5, "all 5 events dead-letter and the stream continues")
    assert(dlq.asScala.head.getAs[String]("error").contains("retry budget exhausted"))
    // the reference leaves orphans in the stream / 0 rows in CH — here the
    // terminal write never succeeded, so nothing landed either
  }

  test("retryable.feature: Mixed — retryable and permanent pipelines do not cross-contaminate") {
    val tableA = new ConcurrentLinkedQueue[Row]
    val dlqA = new ConcurrentLinkedQueue[Row]
    val dlqB = new ConcurrentLinkedQueue[Row]
    val callsA = new AtomicInteger
    val handlerA = ClickHouseSink.foreachBatchHandler(cfg(), d => d.collect().foreach(dlqA.add),
      write = Some { df =>
        if (callsA.incrementAndGet() <= 1) throw chError(202) // overload, recovers
        df.collect().foreach(tableA.add)
      })
    val handlerB = ClickHouseSink.foreachBatchHandler(cfg(), d => d.collect().foreach(dlqB.add),
      write = Some { _ => throw chError(53) }) // TYPE_MISMATCH, permanent
    engineLoop(handlerA, events(4), batchId = 1L)
    handlerB(events(4), 1L)
    assert(tableA.size == 4 && dlqA.isEmpty,
      "pipeline A recovers cleanly despite pipeline B failing")
    assert(dlqB.size == 4,
      "pipeline B dead-letters all 4 events without disturbing pipeline A")
  }

  test("dlq.feature: DLQ as a Kafka topic — envelopes produce and re-consume over the wire") {
    // the reference's DLQ is a STREAM (dlq_processor publishes envelopes
    // to NATS); with the wire producer the DLQ can be a real Kafka topic:
    // permanent sink fault → envelopes produced → read back via the source
    val c = new graft.sources.kafka.MiniKafkaBroker.Cluster()
    val b = c.addBroker()
    c.addPartition("pipeline-dlq", 0)
    try {
      val handler = ClickHouseSink.foreachBatchHandler(cfg(),
        Dlq.writeKafka(b.address, "pipeline-dlq"),
        write = Some { _ => throw chError(6) })
      handler(events(3), 1L)
      val consumed = spark.read.format("graft-kafka")
        .option("brokers", b.address).option("topic", "pipeline-dlq").load()
        .selectExpr("cast(value as string) as v").collect().map(_.getString(0))
      assert(consumed.length == 3)
      consumed.foreach { j =>
        assert(j.contains(""""component":"sink""""), j)
        assert(j.contains("Code: 6"), j)
        assert(j.contains("event_id"), j)
      }
    } finally c.stop()
  }

  test("dlq.feature: sink against an incompatible table dead-letters everything (real driver)") {
    // the genuine JDBC leg (Spark's JDBC writer auto-creates a MISSING
    // table, so the feature's wrong-table fault is modeled as an existing
    // table whose schema cannot accept the rows): Derby raises a real
    // SQLException; classification must route the batch to the DLQ
    val url = "jdbc:derby:memory:graft_sinkfeat;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE WRONG_SHAPE (ONLY_COL INT NOT NULL)")
    finally conn.close()
    val dlq = new ConcurrentLinkedQueue[Row]
    val c = ClickHouseSink.Config(
      url = url, database = "APP", table = "WRONG_SHAPE",
      username = "", password = "", mappings = Nil)
    val handler = ClickHouseSink.foreachBatchHandler(c, d => d.collect().foreach(dlq.add))
    handler(events(4), 3L)
    assert(dlq.size == 4, "dlq should contain 4 events, stream not wedged")
    assert(dlq.asScala.head.getAs[String]("component") == "sink")
  }
}
