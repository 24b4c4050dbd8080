package graft.sources.kafka

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import MiniKafkaBroker.Cluster

/** WRITE side of `format("graft-kafka")` over real sockets: batch saves and
  * streaming sinks produce v2 record batches to the broker fixture via
  * Produce v3, then everything is read BACK through the source — a full
  * produce→consume round trip on the same wire pair. */
class KafkaWriteSpec extends SparkSpec {
  import spark.implicits._

  private def withCluster(brokers: Int = 1)(f: Cluster => Unit): Unit = {
    val c = new Cluster()
    (0 until brokers).foreach(_ => c.addBroker())
    try f(c) finally c.stop()
  }

  private def addr(c: Cluster): String = c.brokerList.map(_.address).mkString(",")

  private def readBack(c: Cluster, topic: String): Seq[(String, String, Int, Long)] =
    spark.read.format("graft-kafka")
      .option("brokers", addr(c)).option("topic", topic).load()
      .collect()
      .map { r =>
        val k = Option(r.getAs[Array[Byte]]("key"))
          .map(new String(_, StandardCharsets.UTF_8)).orNull
        val v = new String(r.getAs[Array[Byte]]("value"), StandardCharsets.UTF_8)
        (k, v, r.getInt(3), r.getLong(4))
      }.toSeq

  test("batch write: value/key rows produce to the topic and read back") {
    withCluster() { c =>
      c.addPartition("out", 0)
      Seq(("k1", "v1"), ("k2", "v2"), (null, "v3"))
        .toDF("key", "value")
        .write.mode("append").format("graft-kafka")
        .option("brokers", addr(c)).option("topic", "out")
        .save()
      val rows = readBack(c, "out")
      assert(rows.map(_._2).toSet == Set("v1", "v2", "v3"))
      assert(rows.find(_._2 == "v1").get._1 == "k1")
      assert(rows.find(_._2 == "v3").get._1 == null, "null keys survive")
      // plain (non-idempotent, non-transactional) batches must carry
      // Kafka's NO_PRODUCER convention on the wire: producerId=-1 AND
      // producerEpoch=-1, not the writer field's initial 0
      val batch = c.topics.get("out")(0).batches.head.bytes
      val pid = java.nio.ByteBuffer.wrap(batch, 43, 8).getLong
      val epoch = java.nio.ByteBuffer.wrap(batch, 51, 2).getShort
      assert(pid == -1L, s"plain batch producerId was $pid")
      assert(epoch == -1, s"plain batch producerEpoch was $epoch")
    }
  }

  test("keyed rows land on a stable key-hashed partition; per-key order holds") {
    withCluster() { c =>
      (0 until 4).foreach(p => c.addPartition("out", p))
      val rows = (0 until 100).map(i => (s"user${i % 10}", s"ev$i"))
      rows.toDF("key", "value")
        .repartition(8) // several Spark tasks, same key-routing everywhere
        .write.mode("append").format("graft-kafka")
        .option("brokers", addr(c)).option("topic", "out")
        .save()
      val got = readBack(c, "out")
      assert(got.size == 100)
      // a key maps to exactly one partition regardless of which task wrote it
      got.groupBy(_._1).foreach { case (k, rs) =>
        assert(rs.map(_._3).distinct.size == 1, s"key $k split across partitions")
      }
      assert(got.map(_._3).distinct.size > 1, "keys should spread over partitions")
      // placement must MATCH the stock Kafka default partitioner
      // (murmur2(key) & 0x7fffffff % n) — a topic shared with any stock
      // producer relies on same-key co-location across both
      got.groupBy(_._1).foreach { case (k, rs) =>
        val expect = (KafkaWireWriter.murmur2(k.getBytes("UTF-8")) & 0x7fffffff) % 4
        assert(rs.head._3 == expect, s"key $k not at the stock partitioner's slot")
      }
    }
  }

  test("murmur2 matches Kafka's published test vectors") {
    // the vectors from Apache Kafka's UtilsTest.testMurmur2 (public domain
    // algorithm, seed 0x9747b28c) — byte-for-byte partitioner parity
    val cases = Seq[(Array[Byte], Int)](
      "21".getBytes("UTF-8") -> -973932308,
      "foobar".getBytes("UTF-8") -> -790332482,
      "a-little-bit-long-string".getBytes("UTF-8") -> -985981536,
      "a-little-bit-longer-string".getBytes("UTF-8") -> -1486304829,
      "lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8".getBytes("UTF-8") -> -58897971,
      Array[Byte]('a', 'b', 'c') -> 479470107,
      Array[Byte](-1, -1, -1) -> murmurOracle(Array[Byte](-1, -1, -1)))
    cases.foreach { case (bytes, want) =>
      assert(KafkaWireWriter.murmur2(bytes) == want,
        s"murmur2 mismatch for ${bytes.toSeq}")
    }
    // tail-length sweep (0..3 trailing bytes) against an independent
    // re-derivation of the reference algorithm
    (0 until 12).foreach { n =>
      val b = Array.tabulate[Byte](n)(i => (i * 37 + 11).toByte)
      assert(KafkaWireWriter.murmur2(b) == murmurOracle(b), s"len $n")
    }
  }

  /** Straight-line transcription of the murmur2 reference pseudocode,
    * written independently of the production loop. */
  private def murmurOracle(data: Array[Byte]): Int = {
    val m = 0x5bd1e995; val r = 24
    var h = 0x9747b28c ^ data.length
    var i = 0
    while (i + 4 <= data.length) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    val left = data.length - i
    if (left == 3) h ^= (data(i + 2) & 0xff) << 16
    if (left >= 2) h ^= (data(i + 1) & 0xff) << 8
    if (left >= 1) { h ^= data(i) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  test("explicit partition and topic columns route rows; headers round-trip") {
    withCluster() { c =>
      c.addPartition("ta", 0); c.addPartition("ta", 1); c.addPartition("tb", 0)
      val df = Seq(
        ("ta", 0, "a0", "h-a0"),
        ("ta", 1, "a1", "h-a1"),
        ("tb", 0, "b0", "h-b0"))
        .toDF("topic", "partition", "v", "hv")
        .select(col("topic"), col("partition"),
          col("v").cast("binary").as("value"),
          array(struct(lit("origin").as("key"),
            col("hv").cast("binary").as("value"))).as("headers"))
      // no 'topic' option: routing comes entirely from the column
      df.write.mode("append").format("graft-kafka").option("brokers", addr(c)).save()
      for ((t, p, v, hv) <- Seq(("ta", 0, "a0", "h-a0"), ("ta", 1, "a1", "h-a1"),
        ("tb", 0, "b0", "h-b0"))) {
        val rows = spark.read.format("graft-kafka")
          .option("brokers", addr(c)).option("topic", t)
          .option("includeHeaders", "true").load()
          .filter(col("partition") === p).collect()
        assert(rows.length == 1, s"$t-$p")
        assert(new String(rows.head.getAs[Array[Byte]]("value"),
          StandardCharsets.UTF_8) == v)
        val hs = rows.head.getAs[scala.collection.Seq[Row]]("headers")
        assert(hs.map(_.getString(0)).toSeq == Seq("origin"))
        assert(new String(hs.head.getAs[Array[Byte]](1), StandardCharsets.UTF_8) == hv)
      }
    }
  }

  test("multi-broker: produced batches go to each partition's leader") {
    withCluster(brokers = 2) { c =>
      c.addPartition("out", 0, leader = 0)
      c.addPartition("out", 1, leader = 1)
      (0 until 20).map(i => (s"k$i", s"v$i")).toDF("key", "value")
        .write.mode("append").format("graft-kafka")
        .option("brokers", c.brokerList.head.address) // only broker 0 listed
        .option("topic", "out").save()
      assert(readBack(c, "out").size == 20,
        "rows on partition 1 require producing to broker 1 (error 6 otherwise)")
    }
  }

  test("leadership change between plan and flush: writer refreshes and retries once") {
    withCluster(brokers = 2) { c =>
      c.addPartition("out", 0, leader = 1)
      // a writer whose cached leader map is STALE (points at broker 0,
      // which answers error 6): the flush must refresh from the control
      // plane and land the batch on the true leader, broker 1
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("key", BinaryType), StructField("value", BinaryType)))
      val eps = c.brokerList.map(b => (b.host, b.port))
      val staleLeaders = Map(("out", 0) -> eps.head) // broker 0 — wrong
      val factory = new KafkaWireWriterFactory(schema, Some("out"), eps,
        staleLeaders, Map("out" -> 1), None, None, flushRecords = 1024)
      val w = factory.createWriter(0, 0L)
      import org.apache.spark.sql.catalyst.InternalRow
      w.write(InternalRow("k1".getBytes(StandardCharsets.UTF_8),
        "v1".getBytes(StandardCharsets.UTF_8)))
      w.write(InternalRow("k2".getBytes(StandardCharsets.UTF_8),
        "v2".getBytes(StandardCharsets.UTF_8)))
      w.commit()
      w.close()
      assert(readBack(c, "out").map(_._2).toSet == Set("v1", "v2"))
    }
  }

  test("streaming sink: micro-batches produce to the topic as they arrive") {
    withCluster() { c =>
      c.addPartition("out", 0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, String)]
      val q = mem.toDF.toDF("key", "value")
        .select(col("key").cast("binary"), col("value").cast("binary"))
        .writeStream.format("graft-kafka")
        .option("brokers", addr(c)).option("topic", "out")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-ksink").toString)
        .start()
      try {
        mem.addData(("k1", "s1"), ("k2", "s2"))
        q.processAllAvailable()
        assert(readBack(c, "out").map(_._2).toSet == Set("s1", "s2"))
        mem.addData(("k3", "s3"))
        q.processAllAvailable()
        assert(readBack(c, "out").map(_._2).toSet == Set("s1", "s2", "s3"))
      } finally q.stop()
    }
  }

  test("compression.type: produced batches carry the codec on the wire and round-trip") {
    for (codecName <- Seq("gzip", "snappy", "lz4", "zstd")) {
      withCluster() { c =>
        c.addPartition("out", 0)
        (0 until 30).map(i => (s"k$i", s"v$i-" + ("x" * 50))).toDF("key", "value")
          .coalesce(1)
          .write.mode("append").format("graft-kafka")
          .option("brokers", addr(c)).option("topic", "out")
          .option("kafka.compression.type", codecName)
          .save()
        val expectedId = Map("gzip" -> 1, "snappy" -> 2, "lz4" -> 3, "zstd" -> 4)(codecName)
        import scala.jdk.CollectionConverters._
        assert(c.producedCodecs.asScala.toSet == Set(expectedId),
          s"$codecName batches must be compressed ON THE WIRE, not just declared")
        assert(readBack(c, "out").map(_._2).toSet ==
          (0 until 30).map(i => s"v$i-" + ("x" * 50)).toSet)
      }
    }
    // default stays uncompressed; nonsense codec is a loud error
    withCluster() { c =>
      c.addPartition("out", 0)
      Seq(("k", "v")).toDF("key", "value")
        .write.mode("append").format("graft-kafka")
        .option("brokers", addr(c)).option("topic", "out").save()
      import scala.jdk.CollectionConverters._
      assert(c.producedCodecs.asScala.toSet == Set(0))
      val ex = intercept[Exception] {
        Seq(("k", "v")).toDF("key", "value")
          .write.mode("append").format("graft-kafka")
          .option("brokers", addr(c)).option("topic", "out")
          .option("compression.type", "brotli").save()
      }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("compression.type"), msgs)
    }
  }

  test("enable.idempotence: an exact retry of a delivered batch is deduplicated broker-side") {
    withCluster() { c =>
      c.addPartition("out", 0)
      val b = c.brokerList.head
      val cl = new WireClient(b.host, b.port)
      try {
        val (pid, epoch) = cl.initProducerId()
        assert(pid >= 1000L && epoch == 0)
        def recs(tag: String, n: Int) = (0 until n).map(i =>
          Records.Record(i.toLong, 7L, null, s"$tag$i".getBytes(StandardCharsets.UTF_8)))
        // batch at sequence 0 lands at offset 0
        assert(cl.produce("out", 0, recs("a", 3), producerId = pid, baseSequence = 0) == 0L)
        // the retry case idempotence exists for: delivered but un-acked →
        // client re-sends the SAME sequence → broker answers the ORIGINAL
        // offset and appends nothing
        assert(cl.produce("out", 0, recs("a", 3), producerId = pid, baseSequence = 0) == 0L)
        assert(readBack(c, "out").size == 3, "the retry must not double rows")
        // next batch continues at sequence 3
        assert(cl.produce("out", 0, recs("b", 2), producerId = pid, baseSequence = 3) == 3L)
        assert(readBack(c, "out").size == 5)
        // a sequence GAP (a batch went missing) is a loud error 45
        val ex = intercept[java.io.IOException] {
          cl.produce("out", 0, recs("c", 1), producerId = pid, baseSequence = 9)
        }
        assert(ex.getMessage.contains("OUT_OF_ORDER_SEQUENCE_NUMBER"), ex.getMessage)
        // a second producer id has its own sequence space
        val (pid2, _) = cl.initProducerId()
        assert(pid2 != pid)
        assert(cl.produce("out", 0, recs("d", 1), producerId = pid2, baseSequence = 0) == 5L)
      } finally cl.close()
    }
  }

  test("enable.idempotence end-to-end: writer sequences survive the NotLeader retry") {
    withCluster(brokers = 2) { c =>
      c.addPartition("out", 0, leader = 1)
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("key", BinaryType), StructField("value", BinaryType)))
      val eps = c.brokerList.map(b => (b.host, b.port))
      // stale leader map → first flush hits broker 0, gets error 6, retries
      // at broker 1 with the SAME sequence
      val factory = new KafkaWireWriterFactory(schema, Some("out"), eps,
        Map(("out", 0) -> eps.head), Map("out" -> 1), None, None,
        flushRecords = 2, idempotent = true)
      val w = factory.createWriter(0, 0L)
      import org.apache.spark.sql.catalyst.InternalRow
      (0 until 5).foreach { i =>
        w.write(InternalRow(s"k$i".getBytes(StandardCharsets.UTF_8),
          s"v$i".getBytes(StandardCharsets.UTF_8)))
      }
      w.commit()
      w.close()
      assert(readBack(c, "out").map(_._2).sorted == (0 until 5).map(i => s"v$i"),
        "five rows exactly once across three sequenced flushes and a leader retry")
      // the broker tracked this producer's sequence progression
      val log = c.topics.get("out")(0)
      assert(log.producerSeqs.values.map(_._1).max == 5, "next expected sequence is 5")
    }
  }

  private def readIso(c: Cluster, topic: String, committed: Boolean): Seq[String] = {
    val r = spark.read.format("graft-kafka")
      .option("brokers", addr(c)).option("topic", topic)
    (if (committed) r.option("kafka.isolation.level", "read_committed") else r)
      .load().collect()
      .map(row => new String(row.getAs[Array[Byte]]("value"), StandardCharsets.UTF_8))
      .toSeq.sorted
  }

  test("transactional.id: task rows are one transaction — invisible until commit, gone on abort") {
    withCluster() { c =>
      c.addPartition("out", 0)
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.catalyst.InternalRow
      val schema = StructType(Seq(
        StructField("key", BinaryType), StructField("value", BinaryType)))
      val eps = c.brokerList.map(b => (b.host, b.port))
      def writer(task: Long) = new KafkaWireWriterFactory(schema, Some("out"), eps,
        Map(("out", 0) -> eps.head), Map("out" -> 1), None, None,
        flushRecords = 2, transactionalId = Some("graft-txn")).createWriter(0, task)

      // attempt 0 flushes mid-task (cap 2) then ABORTS — its rows reached
      // the log but must never reach a read_committed consumer
      val w0 = writer(0L)
      (0 until 4).foreach(i => w0.write(InternalRow(null, s"dead$i".getBytes)))
      w0.abort(); w0.close()
      assert(readIso(c, "out", committed = true).isEmpty,
        "aborted task rows must be invisible under read_committed")
      assert(readIso(c, "out", committed = false).size == 4,
        "read_uncommitted surfaces the orphaned rows (they ARE in the log)")

      // the retry commits: exactly its rows appear; the aborted ones stay gone
      val w1 = writer(1L)
      (0 until 4).foreach(i => w1.write(InternalRow(null, s"live$i".getBytes)))
      // mid-transaction: flushed rows exist but stay behind the LSO
      assert(readIso(c, "out", committed = true).isEmpty,
        "uncommitted transaction rows must stay behind the LSO")
      w1.commit(); w1.close()
      assert(readIso(c, "out", committed = true) ==
        (0 until 4).map(i => s"live$i").sorted,
        "exactly the committed attempt's rows, never the aborted ones")
      assert(readIso(c, "out", committed = false).size == 8)
    }
  }

  test("transactional.id end-to-end: DataFrame write commits one txn per task") {
    // TWO brokers with split leadership: txn RPCs must go to the
    // coordinator (FindCoordinator key_type=1 → broker 0) while produces
    // go to each partition's leader — a client that conflates the two dies
    // on error 16 / error 6
    withCluster(brokers = 2) { c =>
      c.addPartition("out", 0, leader = 0); c.addPartition("out", 1, leader = 1)
      (0 until 20).map(i => (s"k$i", s"v$i")).toDF("key", "value")
        .repartition(3)
        .write.mode("append").format("graft-kafka")
        .option("brokers", addr(c)).option("topic", "out")
        .option("kafka.transactional.id", "graft-batch")
        .option("kafka.transaction.timeout.ms", "120000")
        .save()
      assert(readIso(c, "out", committed = true) ==
        (0 until 20).map(i => s"v$i").sorted,
        "all rows visible to read_committed after every task committed")
      assert(c.lastTxnTimeoutMs == 120000,
        "the configured transaction timeout must reach InitProducerId")
    }
  }

  test("zombie fencing: re-initializing a transactional.id bumps the epoch and fences the old one") {
    withCluster(brokers = 2) { c =>
      c.addPartition("out", 0)
      val coordB = c.brokerList.head
      val cl = new WireClient(coordB.host, coordB.port)
      try {
        // same transactional.id → SAME producer id, bumped epoch
        val (pid0, e0) = cl.initProducerId(transactionalId = "job-7")
        val (pid1, e1) = cl.initProducerId(transactionalId = "job-7")
        assert(pid0 == pid1 && e0 == 0 && e1 == 1)
        // the zombie (epoch 0) can no longer produce, declare, or end
        val recs = Seq(Records.Record(0L, 7L, null, "z".getBytes(StandardCharsets.UTF_8)))
        val ex = intercept[java.io.IOException] {
          cl.produce("out", 0, recs, producerId = pid0,
            baseSequence = 0, transactionalId = "job-7", producerEpoch = e0)
        }
        assert(ex.getMessage.contains("FENCED"), ex.getMessage)
        val ex2 = intercept[java.io.IOException] {
          cl.addPartitionsToTxn("job-7", pid0, e0, "out", Seq(0))
        }
        assert(ex2.getMessage.contains("47"), ex2.getMessage)
        val ex3 = intercept[java.io.IOException](cl.endTxn("job-7", pid0, e0, commit = true))
        assert(ex3.getMessage.contains("47"), ex3.getMessage)
        // the CURRENT instance (epoch 1) flows normally
        cl.addPartitionsToTxn("job-7", pid1, e1, "out", Seq(0))
        cl.produce("out", 0, recs, producerId = pid1,
          baseSequence = 0, transactionalId = "job-7", producerEpoch = e1)
        cl.endTxn("job-7", pid1, e1, commit = true)
        assert(readIso(c, "out", committed = true) == Seq("z"))
      } finally cl.close()

      // txn RPCs sent to a NON-coordinator are refused with error 16 —
      // the contract that makes FindCoordinator(key_type=1) mandatory
      val wrongB = c.brokerList(1)
      val wrong = new WireClient(wrongB.host, wrongB.port)
      try {
        val ex = intercept[java.io.IOException](
          wrong.initProducerId(transactionalId = "job-8"))
        assert(ex.getMessage.contains("16"), ex.getMessage)
        // ...and FindCoordinator names the real one
        assert(wrong.findTxnCoordinator("job-8").nodeId == coordB.nodeId)
      } finally wrong.close()
    }
  }

  test("transactional.id streaming sink: every micro-batch epoch commits cleanly") {
    withCluster() { c =>
      c.addPartition("out", 0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, String)]
      val q = mem.toDF.toDF("key", "value")
        .select(col("key").cast("binary"), col("value").cast("binary"))
        .writeStream.format("graft-kafka")
        .option("brokers", addr(c)).option("topic", "out")
        .option("kafka.transactional.id", "graft-stream")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-txn-sink").toString)
        .start()
      try {
        mem.addData(("k1", "e0-a"), ("k2", "e0-b"))
        q.processAllAvailable()
        assert(readIso(c, "out", committed = true) == Seq("e0-a", "e0-b"),
          "epoch 0's transaction committed — rows visible to read_committed")
        mem.addData(("k3", "e1-a"))
        q.processAllAvailable()
        assert(readIso(c, "out", committed = true) == Seq("e0-a", "e0-b", "e1-a"),
          "each epoch is its own committed transaction")
      } finally q.stop()
    }
  }

  test("dynamic-topic writes never leak the internal placeholder to the broker") {
    withCluster() { c =>
      c.addPartition("real", 0)
      Seq(("real", "dyn0"), ("real", "dyn1")).toDF("topic", "v")
        .select(col("topic"), col("v").cast("binary").as("value"))
        .write.mode("append").format("graft-kafka")
        .option("brokers", addr(c)).save() // no topic option: column routes
      assert(readBack(c, "real").map(_._2).toSet == Set("dyn0", "dyn1"))
      import scala.jdk.CollectionConverters._
      assert(!c.metadataRequests.asScala.exists(_.contains("__graft_dynamic")),
        "a cluster with topic auto-create would mint a junk topic from the placeholder")
    }
  }

  test("a declared topic that does not exist fails on the driver, not as floorMod-by-zero") {
    withCluster() { c =>
      val ex = intercept[Exception] {
        Seq(("k", "v")).toDF("key", "value")
          .write.mode("append").format("graft-kafka")
          .option("brokers", addr(c)).option("topic", "ghost").save()
      }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("metadata error 3"), msgs)
    }
  }

  test("writer control-plane failover: dead first broker in the list is skipped") {
    val dead = {
      val ss = new java.net.ServerSocket(0)
      val p = ss.getLocalPort
      ss.close()
      s"127.0.0.1:$p"
    }
    withCluster() { c =>
      c.addPartition("real", 0)
      // topic-COLUMN routing forces the task-side control plane (ensureTopic)
      // through the failover path, not just the driver's connectControl
      Seq(("real", "alive")).toDF("topic", "v")
        .select(col("topic"), col("v").cast("binary").as("value"))
        .write.mode("append").format("graft-kafka")
        .option("brokers", s"$dead,${addr(c)}").save()
      assert(readBack(c, "real").map(_._2).toSeq == Seq("alive"))
    }
  }

  test("a write without value column or topic fails loudly") {
    withCluster() { c =>
      c.addPartition("out", 0)
      val noValue = intercept[Exception] {
        Seq("x").toDF("notvalue").write.mode("append").format("graft-kafka")
          .option("brokers", addr(c)).option("topic", "out").save()
      }
      val msgs1 = Iterator.iterate(noValue: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      assert(msgs1.contains("'value' column"), msgs1)
      val noTopic = intercept[Exception] {
        Seq("x").toDF("value").select(col("value").cast("binary"))
          .write.mode("append").format("graft-kafka").option("brokers", addr(c)).save()
      }
      val msgs2 = Iterator.iterate(noTopic: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      assert(msgs2.contains("topic"), msgs2)
    }
  }
}
