package graft.sources.kafka

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}

import graft.SparkSpec
import MiniKafkaBroker.{Cluster, SaslUser}

/** End-to-end spec for `format("graft-kafka")` over [[MiniKafkaBroker]]'s
  * REAL sockets: offset planning → leader-routed fetches → CRC'd record
  * batches → checkpoint commit, plus the SASL legs. This is the executable
  * counterpart of the reference's consumer behavior
  * (glassflow-api/internal/kafka/consumer.go:102-210,
  * tests/features/ingestor/ingestor.feature). */
class KafkaWireSpec extends SparkSpec {

  private def withCluster(sasl: Option[SaslUser] = None, brokers: Int = 1)
                         (f: Cluster => Unit): Unit = {
    val c = new Cluster(sasl)
    (0 until brokers).foreach(_ => c.addBroker())
    try f(c) finally c.stop()
  }

  private def brokerList(c: Cluster): String = c.brokerList.map(_.address).mkString(",")

  private def readBatch(brokers: String, topic: String,
                        extra: Map[String, String] = Map.empty): DataFrame =
    extra.foldLeft(
      spark.read.format("graft-kafka").option("brokers", brokers).option("topic", topic)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  private def valueStr(r: Row): String =
    new String(r.getAs[Array[Byte]]("value"), StandardCharsets.UTF_8)

  /** Drain a streaming query through foreachBatch (memory sink cannot
    * recover from a checkpoint; foreachBatch can), recording
    * (batchId, partition, offset, value). */
  private def runStream(brokers: String, topic: String, checkpoint: String,
                        sink: ConcurrentLinkedQueue[(Long, Int, Long, String)],
                        extra: Map[String, String] = Map.empty): Unit = {
    val src = extra.foldLeft(
      spark.readStream.format("graft-kafka").option("brokers", brokers).option("topic", topic)
    ) { case (r, (k, v)) => r.option(k, v) }.load()
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.selectExpr("partition", "offset", "cast(value as string) as v")
          .collect()
          .foreach(r => sink.add((id, r.getInt(0), r.getLong(1), r.getString(2))))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-kafka-$tag").toString

  // --- plain batch read ----------------------------------------------------

  test("batch read: all partitions, stock-source schema, CreateTime timestamps") {
    withCluster() { c =>
      c.addPartition("t", 0); c.addPartition("t", 1)
      c.append("t", 0, Seq("k0" -> "a", "k1" -> "b"), timestampMs = 1700000000123L)
      c.append("t", 1, Seq((null, "c")), timestampMs = 1700000000456L)
      val df = readBatch(brokerList(c), "t")
      assert(df.schema == KafkaWireSource.Schema)
      val rows = df.collect().sortBy(r => (r.getInt(3), r.getLong(4)))
      assert(rows.map(valueStr).toSeq == Seq("a", "b", "c"))
      assert(rows.map(_.getInt(3)).toSeq == Seq(0, 0, 1))
      assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 1L, 0L))
      // CreateTime: per-record producer timestamps, type 0
      assert(rows.map(_.getInt(6)).forall(_ == 0))
      assert(rows.head.getTimestamp(5).getTime == 1700000000123L)
      assert(rows(2).getAs[Array[Byte]]("key") == null) // null key survives
    }
  }

  test("LogAppendTime batches surface timestampType=1 and the broker append time") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "v1", "k" -> "v2"),
        timestampMs = 1700000005000L, attributes = 0x08)
      val rows = readBatch(brokerList(c), "t").collect().sortBy(_.getLong(4))
      assert(rows.map(_.getInt(6)).toSeq == Seq(1, 1))
      // LogAppendTime: every record carries the batch maxTimestamp
      assert(rows.map(_.getTimestamp(5).getTime).toSeq ==
        Seq(1700000005001L, 1700000005001L))
    }
  }

  // --- multi-broker leader routing -----------------------------------------

  test("fetches route to each partition's leader, never the control broker") {
    withCluster(brokers = 2) { c =>
      // split leadership: p0 on broker 0, p1 on broker 1
      c.addPartition("t", 0, leader = 0)
      c.addPartition("t", 1, leader = 1)
      c.append("t", 0, (0 until 5).map(i => s"k$i" -> s"b0-$i"))
      c.append("t", 1, (0 until 7).map(i => s"k$i" -> s"b1-$i"))
      // brokers option lists ONLY broker 0 — partition 1's rows are served
      // exclusively by broker 1, found via Metadata. A client that fetched
      // from the control broker would die on error 6 (NOT_LEADER).
      val only0 = c.brokerList.head.address
      val rows = readBatch(only0, "t").collect()
      assert(rows.length == 12)
      assert(rows.count(_.getInt(3) == 1) == 7)
    }
  }

  test("control-plane failover: dead first broker in the list is skipped") {
    // A port with nothing listening: bind + close to reserve a dead address.
    val dead = {
      val ss = new java.net.ServerSocket(0)
      val p = ss.getLocalPort
      ss.close()
      s"127.0.0.1:$p"
    }
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "alive"))
      val rows = readBatch(s"$dead,${brokerList(c)}", "t").collect()
      assert(rows.map(valueStr).toSeq == Seq("alive"))
    }
  }

  // --- control / compacted batches ------------------------------------------

  test("control batches and compacted tails advance the cursor without spinning") {
    withCluster() { c =>
      c.addPartition("t", 0)
      // offsets 0-1: data
      c.append("t", 0, Seq("k" -> "d0", "k" -> "d1"))
      // offset 2: transaction control marker (attributes bit 5) — no rows
      c.appendRaw("t", 0, 2, 2,
        Records.encodeBatch(2, Seq(Records.Record(2, 1700000000000L,
          Array[Byte](0, 0), Array[Byte](0))), attributes = 0x20))
      // offsets 3-7: compacted batch — records 3,4 survive, header spans to 7
      c.appendRaw("t", 0, 3, 7,
        Records.encodeBatch(3,
          Seq(Records.Record(3, 1700000000003L, null, "d3".getBytes),
              Records.Record(4, 1700000000004L, null, "d4".getBytes)),
          lastOffsetDeltaOverride = 4))
      // offsets 8-9: data after the gap
      c.append("t", 0, Seq("k" -> "d8", "k" -> "d9"))
      val rows = readBatch(brokerList(c), "t").collect().sortBy(_.getLong(4))
      assert(rows.map(valueStr).toSeq == Seq("d0", "d1", "d3", "d4", "d8", "d9"))
      assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 1L, 3L, 4L, 8L, 9L))
    }
  }

  // --- streaming: admission control, checkpointing, new partitions ----------

  test("maxOffsetsPerTrigger distributes the row cap proportional to lag") {
    withCluster() { c =>
      c.addPartition("t", 0); c.addPartition("t", 1)
      c.append("t", 0, (0 until 80).map(i => s"k$i" -> s"p0-$i"))
      c.append("t", 1, (0 until 20).map(i => s"k$i" -> s"p1-$i"))
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", tempDir("admission"), seen,
        Map("maxOffsetsPerTrigger" -> "50"))
      val all = seen.asScala.toSeq
      assert(all.size == 100)
      assert(all.map(t => (t._2, t._3)).distinct.size == 100) // no dups
      // first micro-batch honors the cap, split 80:20 → 40 + 10
      val first = all.filter(_._1 == 0L)
      assert(first.size == 50)
      assert(first.count(_._2 == 0) == 40)
      assert(first.count(_._2 == 1) == 10)
      assert(all.map(_._1).max >= 1L) // the rest arrived in later batches
    }
  }

  test("checkpoint stop/resume: no loss, no duplicates across restarts") {
    withCluster() { c =>
      c.addPartition("t", 0); c.addPartition("t", 1)
      c.append("t", 0, (0 until 6).map(i => s"k$i" -> s"a$i"))
      c.append("t", 1, (0 until 4).map(i => s"k$i" -> s"b$i"))
      val ckpt = tempDir("resume")
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", ckpt, seen)
      assert(seen.size == 10)
      // new data lands while the query is DOWN
      c.append("t", 0, (6 until 9).map(i => s"k$i" -> s"a$i"))
      c.append("t", 1, (4 until 5).map(i => s"k$i" -> s"b$i"))
      runStream(brokerList(c), "t", ckpt, seen)
      val all = seen.asScala.toSeq
      assert(all.size == 14, "restart must deliver exactly the 4 new rows")
      assert(all.map(t => (t._2, t._3)).distinct.size == 14)
      assert(all.map(_._4).toSet ==
        ((0 until 9).map(i => s"a$i") ++ (0 until 5).map(i => s"b$i")).toSet)
    }
  }

  test("partition created after the checkpoint is read from earliest") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "old0", "k" -> "old1"))
      val ckpt = tempDir("newpart")
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", ckpt, seen)
      assert(seen.size == 2)
      // p1 appears (with pre-existing rows) only after the checkpoint
      c.addPartition("t", 1)
      c.append("t", 1, Seq("k" -> "new0", "k" -> "new1", "k" -> "new2"))
      runStream(brokerList(c), "t", ckpt, seen)
      val p1 = seen.asScala.toSeq.filter(_._2 == 1)
      assert(p1.map(_._3).sorted == Seq(0L, 1L, 2L),
        "new partition must start from offset 0, not its log end")
      assert(seen.size == 5)
    }
  }

  test("startingOffsets=latest skips pre-existing rows in streaming mode") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "pre0", "k" -> "pre1"))
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      val src = spark.readStream.format("graft-kafka")
        .option("brokers", brokerList(c)).option("topic", "t")
        .option("startingOffsets", "latest").load()
      val q = src.writeStream
        .option("checkpointLocation", tempDir("latest"))
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.selectExpr("partition", "offset", "cast(value as string) as v").collect()
            .foreach(r => seen.add((id, r.getInt(0), r.getLong(1), r.getString(2))))
        }.start()
      try {
        q.processAllAvailable()
        assert(seen.isEmpty, "latest start must not read the backlog")
        c.append("t", 0, Seq("k" -> "live"))
        q.processAllAvailable()
        assert(seen.asScala.map(_._4).toSeq == Seq("live"))
      } finally q.stop()
    }
  }

  // --- SASL end-to-end -------------------------------------------------------

  private val saslExtras = Map("sasl.username" -> "svc", "sasl.password" -> "s3cr3t!")

  for (mech <- Seq("PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512")) {
    test(s"SASL $mech: authenticated read end-to-end") {
      withCluster(sasl = Some(SaslUser("svc", "s3cr3t!")), brokers = 2) { c =>
        c.addPartition("t", 0, leader = 0)
        c.addPartition("t", 1, leader = 1)
        c.append("t", 0, Seq("k" -> "auth0"))
        c.append("t", 1, Seq("k" -> "auth1"))
        val rows = readBatch(brokerList(c), "t",
          saslExtras + ("sasl.mechanism" -> mech)).collect()
        assert(rows.map(valueStr).toSet == Set("auth0", "auth1"))
      }
    }
  }

  test("SASL wrong password fails with a clean auth error, not a hang or OOB") {
    withCluster(sasl = Some(SaslUser("svc", "s3cr3t!"))) { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "v"))
      for (mech <- Seq("PLAIN", "SCRAM-SHA-256")) {
        val ex = intercept[Exception] {
          readBatch(brokerList(c), "t",
            Map("sasl.mechanism" -> mech, "sasl.username" -> "svc",
              "sasl.password" -> "WRONG")).collect()
        }
        val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
        assert(msgs.contains("SASL authentication failed") ||
          msgs.contains("SCRAM proof mismatch"), s"$mech: $msgs")
      }
    }
  }

  test("unauthenticated connections cannot fetch from a SASL listener") {
    withCluster(sasl = Some(SaslUser("svc", "s3cr3t!"))) { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "v"))
      val b = c.brokerList.head
      intercept[Exception] {
        val cl = new WireClient(b.host, b.port) // no sasl config
        try cl.metadata("t") finally cl.close()
      }
      ()
    }
  }

  test("tampered SCRAM server signature is rejected as a MITM") {
    withCluster(sasl = Some(SaslUser("svc", "s3cr3t!"))) { c =>
      c.tamperScramServerSignature = true
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "v"))
      val ex = intercept[Exception] {
        readBatch(brokerList(c), "t",
          saslExtras + ("sasl.mechanism" -> "SCRAM-SHA-256")).collect()
      }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("server signature mismatch"), msgs)
    }
  }

  test("SaslConfig never prints the password (plan descriptions, task logs)") {
    val cfg = WireClient.SaslConfig("PLAIN", "svc", "hunter2")
    assert(!cfg.toString.contains("hunter2"))
    val part = KafkaWirePartition("h", 1, "t", 0, 0L, 1L, Some(cfg))
    assert(!part.toString.contains("hunter2"))
  }

  test("tiny fetch.max_bytes forces batch-at-a-time fetches without losing rows") {
    withCluster() { c =>
      c.addPartition("t", 0)
      // 6 separate batches, each ~90 wire bytes — a 100-byte response cap
      // admits exactly one per fetch (the first batch always fits), so the
      // reader must loop 6 times and still surface every row in order
      (0 until 6).foreach(i => c.append("t", 0, Seq(s"k$i" -> s"v$i")))
      val rows = readBatch(brokerList(c), "t",
        Map("fetch.max_bytes" -> "100", "fetch.min_bytes" -> "1",
          "fetch.max_wait_ms" -> "10")).collect().sortBy(_.getLong(4))
      assert(rows.map(valueStr).toSeq == (0 until 6).map(i => s"v$i"))
    }
  }

  test("fetch tuning options parse and reject nonsense") {
    val o = KafkaWireSource.parseOptions(Map(
      "brokers" -> "h:1", "topic" -> "t",
      "fetch.min_bytes" -> "102400", "fetch.max_bytes" -> "1048576",
      "fetch.max_wait_ms" -> "750"))
    assert(o.fetch == KafkaWireSource.FetchTuning(102400, 1048576, 750))
    assertThrows[IllegalArgumentException](KafkaWireSource.parseOptions(Map(
      "brokers" -> "h:1", "topic" -> "t", "fetch.max_bytes" -> "0")))
  }

  test("bounded batch read: explicit starting/ending offset JSON (backfill surface)") {
    withCluster() { c =>
      c.addPartition("t", 0); c.addPartition("t", 1)
      c.append("t", 0, (0 until 10).map(i => s"k$i" -> s"p0-$i"))
      c.append("t", 1, (0 until 6).map(i => s"k$i" -> s"p1-$i"))
      // window [2, 7) on p0; p1 from sentinel -2 (earliest) to absent (latest)
      val rows = readBatch(brokerList(c), "t", Map(
        "startingOffsets" -> """{"t":{"0":2,"1":-2}}""",
        "endingOffsets" -> """{"t":{"0":7}}""")).collect()
      val p0 = rows.filter(_.getInt(3) == 0).map(_.getLong(4)).sorted
      val p1 = rows.filter(_.getInt(3) == 1).map(_.getLong(4)).sorted
      assert(p0.toSeq == (2L until 7L), "p0 reads exactly the requested window")
      assert(p1.toSeq == (0L until 6L), "p1 defaults earliest→latest")
      // unknown partition in the JSON is a loud error, not silence
      intercept[Exception](readBatch(brokerList(c), "t",
        Map("startingOffsets" -> """{"t":{"9":0}}""")).collect())
      ()
    }
  }

  test("streaming startingOffsets as explicit JSON skips the pre-window backlog") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, (0 until 8).map(i => s"k$i" -> s"v$i"))
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", tempDir("startjson"), seen,
        Map("startingOffsets" -> """{"t":{"0":5}}"""))
      assert(seen.asScala.map(_._4).toSeq.sorted == Seq("v5", "v6", "v7"))
    }
  }

  test("minPartitions splits offset ranges so few Kafka partitions can use many cores") {
    // pure split math: 2 ranges of 100 and 10 rows → ≥8 splits, exact cover
    val ranges = Seq((("t", 0), 0L, 100L), (("t", 1), 50L, 60L))
    val split = KafkaWireSource.splitRanges(ranges, 8)
    assert(split.size >= 8)
    for (tp <- Seq(("t", 0), ("t", 1))) {
      val rs = split.filter(_._1 == tp).sortBy(_._2)
      val (origStart, origEnd) = ranges.find(_._1 == tp).map(r => (r._2, r._3)).get
      assert(rs.head._2 == origStart && rs.last._3 == origEnd)
      rs.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 == b._2, "splits must tile without gap/overlap")
        case _ => ()
      }
    }
    // ranges already ≥ minPartitions pass through untouched
    assert(KafkaWireSource.splitRanges(ranges, 2) == ranges)
    // a 1-row range cannot split below one row
    assert(KafkaWireSource.splitRanges(Seq((("t", 0), 5L, 6L)), 4) ==
      Seq((("t", 0), 5L, 6L)))

    // end-to-end: a single hot partition read with minPartitions=4 still
    // yields every row exactly once
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, (0 until 40).map(i => s"k$i" -> s"v$i"))
      val rows = readBatch(brokerList(c), "t", Map("minPartitions" -> "4")).collect()
      assert(rows.map(_.getLong(4)).sorted.toSeq == (0L until 40L))
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", tempDir("minparts"), seen,
        Map("minPartitions" -> "4"))
      assert(seen.asScala.map(_._3).toSeq.sorted == (0L until 40L))
    }
  }

  test("includeHeaders surfaces record headers as the stock source's column") {
    withCluster() { c =>
      c.addPartition("t", 0)
      val recs = Seq(
        Records.Record(0L, 1700000000000L, null, "h0".getBytes(StandardCharsets.UTF_8),
          headers = Seq("trace-id" -> "abc123".getBytes(StandardCharsets.UTF_8),
            "null-h" -> null)),
        Records.Record(1L, 1700000000001L, null, "h1".getBytes(StandardCharsets.UTF_8)))
      // headers must also survive a compressed batch
      c.appendRaw("t", 0, 0, 1,
        Records.encodeBatch(0L, recs, attributes = Records.CodecGzip))
      val df = spark.read.format("graft-kafka")
        .option("brokers", brokerList(c)).option("topic", "t")
        .option("includeHeaders", "true").load()
      assert(df.schema.fieldNames.last == "headers")
      val rows = df.collect().sortBy(_.getLong(4))
      val h0 = rows(0).getAs[scala.collection.Seq[Row]]("headers")
      assert(h0.map(_.getString(0)).toSeq == Seq("trace-id", "null-h"))
      assert(new String(h0.head.getAs[Array[Byte]](1), StandardCharsets.UTF_8) == "abc123")
      assert(h0(1).get(1) == null, "null header values survive")
      assert(rows(1).getAs[scala.collection.Seq[Row]]("headers").isEmpty)
      // without the option the schema stays byte-identical to the stock default
      val plain = spark.read.format("graft-kafka")
        .option("brokers", brokerList(c)).option("topic", "t").load()
      assert(!plain.schema.fieldNames.contains("headers"))
      assert(plain.count() == 2)
    }
  }

  test("subscribePattern: regex topic discovery; mid-stream topics join from earliest") {
    withCluster() { c =>
      c.addPartition("events.a", 0); c.addPartition("events.b", 0)
      c.addPartition("audit", 0)
      c.append("events.a", 0, Seq("k" -> "ea"))
      c.append("events.b", 0, Seq("k" -> "eb"))
      c.append("audit", 0, Seq("k" -> "au"))
      // batch: pattern resolves against the broker's full topic list
      val rows = spark.read.format("graft-kafka")
        .option("brokers", brokerList(c))
        .option("subscribePattern", "events\\..*").load().collect()
      assert(rows.map(valueStr).toSet == Set("ea", "eb"), "audit must not match")
      // streaming: the pattern re-resolves per trigger — a topic created
      // while the query RUNS starts flowing from earliest
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      val src = spark.readStream.format("graft-kafka")
        .option("brokers", brokerList(c))
        .option("subscribePattern", "events\\..*").load()
      val q = src.writeStream
        .option("checkpointLocation", tempDir("pattern"))
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.selectExpr("partition", "offset", "cast(value as string) as v").collect()
            .foreach(r => seen.add((id, r.getInt(0), r.getLong(1), r.getString(2))))
        }.start()
      try {
        q.processAllAvailable()
        assert(seen.asScala.map(_._4).toSet == Set("ea", "eb"))
        c.addPartition("events.c", 0)
        c.append("events.c", 0, Seq("k" -> "ec0", "k" -> "ec1"))
        q.processAllAvailable()
        assert(seen.asScala.map(_._4).toSet == Set("ea", "eb", "ec0", "ec1"),
          "the new matching topic's backlog flows from offset 0")
      } finally q.stop()
      // pattern + explicit list is a config error, not a silent preference
      assertThrows[IllegalArgumentException](KafkaWireSource.parseOptions(Map(
        "brokers" -> "h:1", "topic" -> "t", "subscribepattern" -> "x.*")))
    }
  }

  test("failOnDataLoss: retention-truncated offsets fail loudly or skip to the log start") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, (0 until 4).map(i => s"k$i" -> s"v$i")) // batch 0-3
      c.append("t", 0, (4 until 8).map(i => s"k$i" -> s"v$i")) // batch 4-7
      c.truncateTo("t", 0, 4)
      val b = c.brokerList.head
      def reader(fdl: Boolean) = KafkaWireReaderFactory.createReader(
        KafkaWirePartition(b.host, b.port, "t", 0, 0L, 8L, None,
          failOnDataLoss = fdl))
      // default: a planned-but-retained range is a loud failure
      val r1 = reader(fdl = true)
      val ex = intercept[java.io.IOException](r1.next())
      assert(ex.getMessage.contains("failOnDataLoss"), ex.getMessage)
      r1.close()
      // opt-in: acknowledge the gap and continue from the log start
      val r2 = reader(fdl = false)
      val got = Seq.newBuilder[Long]
      while (r2.next()) got += r2.get().getLong(4)
      r2.close()
      assert(got.result() == (4L until 8L), "offsets 0-3 skipped, 4-7 delivered")
    }
  }

  test("failOnDataLoss=false end-to-end: checkpointed stream survives retention while down") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, (0 until 4).map(i => s"k$i" -> s"v$i"))
      val ckpt = tempDir("retention")
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", ckpt, seen, Map("failOnDataLoss" -> "false"))
      assert(seen.size == 4)
      // while the query is down: new data lands AND retention eats part of it
      c.append("t", 0, (4 until 8).map(i => s"k$i" -> s"v$i"))
      c.truncateTo("t", 0, 6)
      runStream(brokerList(c), "t", ckpt, seen, Map("failOnDataLoss" -> "false"))
      assert(seen.asScala.map(_._3).toSeq.sorted == (0L until 4L) ++ (6L until 8L),
        "the retained gap 4-5 is skipped; 6-7 delivered exactly once")
    }
  }

  test("assign: explicit partition JSON reads only the named partitions") {
    withCluster() { c =>
      c.addPartition("ta", 0); c.addPartition("ta", 1); c.addPartition("tb", 0)
      c.append("ta", 0, Seq("k" -> "a0"))
      c.append("ta", 1, Seq("k" -> "a1"))
      c.append("tb", 0, Seq("k" -> "b0"))
      val rows = spark.read.format("graft-kafka")
        .option("brokers", brokerList(c))
        .option("assign", """{"ta":[1],"tb":[0]}""").load().collect()
      assert(rows.map(valueStr).toSet == Set("a1", "b0"), "ta-0 must be excluded")
      // assigning a partition that does not exist is loud
      val ex = intercept[Exception] {
        spark.read.format("graft-kafka")
          .option("brokers", brokerList(c))
          .option("assign", """{"ta":[7]}""").load().collect()
      }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("do not exist"), msgs)
      // assign + subscribe is a config error
      assertThrows[IllegalArgumentException](KafkaWireSource.parseOptions(Map(
        "brokers" -> "h:1", "topic" -> "t", "assign" -> """{"t":[0]}""")))
    }
  }

  test("minOffsetsPerTrigger defers small batches; maxTriggerDelay bounds staleness") {
    withCluster() { c =>
      c.addPartition("t", 0)
      val seen = new ConcurrentLinkedQueue[String]
      val src = spark.readStream.format("graft-kafka")
        .option("brokers", brokerList(c)).option("topic", "t")
        .option("minOffsetsPerTrigger", "5")
        .option("maxTriggerDelay", "2s")
        .load()
      val q = src.writeStream
        .option("checkpointLocation", tempDir("minrows"))
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.selectExpr("cast(value as string) as v").collect()
            .foreach(r => seen.add(r.getString(0)))
        }.start()
      def awaitCount(n: Int, ms: Long): Boolean = {
        val deadline = System.currentTimeMillis() + ms
        while (seen.size < n && System.currentTimeMillis() < deadline) Thread.sleep(50)
        seen.size >= n
      }
      try {
        // 6 rows ≥ min(5): flows promptly
        c.append("t", 0, (0 until 6).map(i => s"k$i" -> s"a$i"))
        assert(awaitCount(6, 15000), s"batch >= min must flow; got ${seen.size}")
        // 2 rows < min: deferred at first, but maxTriggerDelay=2s bounds
        // the wait — they must arrive without ever reaching the minimum
        c.append("t", 0, Seq("k" -> "late0", "k" -> "late1"))
        assert(awaitCount(8, 20000),
          s"maxTriggerDelay must flush a sub-minimum batch; got ${seen.size}")
        assert(seen.asScala.toSet ==
          ((0 until 6).map(i => s"a$i").toSet ++ Set("late0", "late1")))
      } finally q.stop()
    }
  }

  test("reader reconnects to the new leader when leadership moves mid-range") {
    withCluster(brokers = 2) { c =>
      val log = c.addPartition("t", 0, leader = 1)
      c.append("t", 0, (0 until 5).map(i => s"k$i" -> s"v$i"))
      // InputPartition planned when broker 0 led (task retries reuse it) —
      // the reader must follow leadership to broker 1 via metadata
      val b0 = c.brokerList.head
      val rdr = KafkaWireReaderFactory.createReader(
        KafkaWirePartition(b0.host, b0.port, "t", 0, 0L, 5L, None))
      val got = Seq.newBuilder[String]
      while (rdr.next()) got += new String(
        rdr.get().getBinary(1), StandardCharsets.UTF_8)
      rdr.close()
      assert(got.result() == (0 until 5).map(i => s"v$i"))
      // a leaderless partition (id absent from the broker list) still
      // fails rather than spinning: second NOT_LEADER surfaces
      log.leader = 99
      val rdr2 = KafkaWireReaderFactory.createReader(
        KafkaWirePartition(b0.host, b0.port, "t", 0, 0L, 5L, None))
      intercept[Exception](while (rdr2.next()) ())
      rdr2.close()
    }
  }

  // --- offset codec ----------------------------------------------------------

  test("checkpoint offset JSON round-trips in the stock nested shape") {
    val m = Map(("events", 0) -> 12L, ("events", 7) -> 3L, ("audit.v2", 12) -> 0L)
    val json = KafkaWireSource.offsetsToJson(m)
    assert(json == """{"audit.v2":{"12":0},"events":{"0":12,"7":3}}""")
    assert(KafkaWireSource.offsetsFromJson(json) == m)
    assert(KafkaWireSource.offsetsFromJson("{}") ==
      Map.empty[(String, Int), Long])
  }

  test("multi-topic subscribe: one query reads several topics, batch and streaming") {
    withCluster() { c =>
      c.addPartition("ta", 0); c.addPartition("tb", 0); c.addPartition("tb", 1)
      c.append("ta", 0, Seq("k" -> "a0", "k" -> "a1"))
      c.append("tb", 0, Seq("k" -> "b0"))
      c.append("tb", 1, Seq("k" -> "b1", "k" -> "b2"))
      // batch over a subscribe list (stock-source option spelling)
      val rows = spark.read.format("graft-kafka")
        .option("brokers", brokerList(c)).option("subscribe", "ta,tb").load()
        .collect()
      assert(rows.length == 5)
      assert(rows.map(r => (r.getString(2), r.getInt(3))).toSet ==
        Set(("ta", 0), ("tb", 0), ("tb", 1)))
      // streaming: both topics drain, checkpoint carries both, a restart
      // delivers only rows appended while down — across topics
      val ckpt = tempDir("multitopic")
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      def streamBoth(): Unit = {
        val src = spark.readStream.format("graft-kafka")
          .option("brokers", brokerList(c)).option("topics", "ta,tb").load()
        val q = src.writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: DataFrame, id: Long) =>
            df.selectExpr("partition", "offset", "concat(topic, ':', cast(value as string)) as v")
              .collect()
              .foreach(r => seen.add((id, r.getInt(0), r.getLong(1), r.getString(2))))
          }.start()
        try q.processAllAvailable() finally q.stop()
      }
      streamBoth()
      assert(seen.size == 5)
      c.append("ta", 0, Seq("k" -> "a2"))
      c.append("tb", 1, Seq("k" -> "b3"))
      streamBoth()
      val vals = seen.asScala.map(_._4).toSeq
      assert(seen.size == 7, "restart delivers exactly the 2 new rows")
      assert(vals.count(_ == "ta:a2") == 1 && vals.count(_ == "tb:b3") == 1)
      assert(vals.toSet == Set("ta:a0", "ta:a1", "ta:a2", "tb:b0", "tb:b1", "tb:b2", "tb:b3"))
    }
  }

  // --- consumer-group offset commits (kafka.group.id) -----------------------

  // Spark's source-commit cadence: MicroBatchStream.commit(N) fires when
  // batch N+1 (with data) STARTS, or when a restart recovers batch N from
  // the commit log — never on graceful stop. The group offset therefore
  // trails the checkpoint by at most one batch; both tests below drive a
  // follow-up batch to make the trailing commit deterministic.

  test("kafka.group.id: completed batches commit group offsets, visible via OffsetFetch") {
    withCluster(brokers = 2) { c =>
      c.addPartition("t", 0, leader = 0)
      c.addPartition("t", 1, leader = 1)
      c.append("t", 0, (0 until 5).map(i => s"k$i" -> s"b0-$i"))
      c.append("t", 1, (0 until 7).map(i => s"k$i" -> s"b1-$i"))
      val tps = Seq(("t", 0), ("t", 1))
      val ckpt = tempDir("groupid")
      val probe = new WireClient(c.brokerList.head.host, c.brokerList.head.port)
      try {
        // nothing committed yet: Kafka's "no committed offset" sentinel
        assert(probe.offsetFetch("graft-cg", tps).values.toSet == Set(-1L))

        val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
        runStream(brokerList(c), "t", ckpt, seen,
          extra = Map("kafka.group.id" -> "graft-cg"))
        assert(seen.size == 12)

        // batch 0's commit fires when batch 1 starts: append one more row
        // and restart on the same checkpoint
        c.append("t", 0, Seq("k" -> "tail"))
        runStream(brokerList(c), "t", ckpt, seen,
          extra = Map("kafka.group.id" -> "graft-cg"))
        assert(seen.size == 13)

        // the coordinator (FindCoordinator → first broker) now holds batch
        // 0's end — each partition's NEXT offset, i.e. the pre-tail log ends
        val coord = probe.findCoordinator("graft-cg")
        assert(coord.nodeId == c.brokerList.head.nodeId)
        assert(probe.offsetFetch("graft-cg", tps) ==
          Map(("t", 0) -> 5L, ("t", 1) -> 7L))
        // other groups are unaffected
        assert(probe.offsetFetch("other-group", tps).values.toSet == Set(-1L))
      } finally probe.close()

      // a commit sent to a NON-coordinator is refused with error 16 — the
      // contract that makes FindCoordinator mandatory
      val wrong = new WireClient(c.brokerList(1).host, c.brokerList(1).port)
      try {
        val ex = intercept[java.io.IOException] {
          wrong.offsetCommit("graft-cg", Map(("t", 0) -> 99L))
        }
        assert(ex.getMessage.contains("error 16"))
      } finally wrong.close()
    }
  }

  test("kafka.group.id commits are observational: restart position comes from the checkpoint") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "v0", "k" -> "v1"))
      val ckpt = tempDir("groupid-ckpt")
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", ckpt, seen, extra = Map("kafka.group.id" -> "cg2"))
      assert(seen.size == 2)
      // sabotage the group offset: rewind it to 0 — if restart consulted the
      // GROUP instead of the checkpoint, v0/v1 would replay
      c.groupOffsets.put(("cg2", "t", 0), 0L)
      c.append("t", 0, Seq("k" -> "v2"))
      runStream(brokerList(c), "t", ckpt, seen, extra = Map("kafka.group.id" -> "cg2"))
      assert(seen.asScala.map(_._4).toSeq.sorted == Seq("v0", "v1", "v2"),
        "restart read exactly the one new row — checkpoint owned the position")
      // batch 0 (end=2) re-committed over the sabotage when batch 1 started
      assert(c.groupOffsets.get(("cg2", "t", 0)) == 2L)
      // one more data-bearing batch commits batch 1's end=3
      c.append("t", 0, Seq("k" -> "v3"))
      runStream(brokerList(c), "t", ckpt, seen, extra = Map("kafka.group.id" -> "cg2"))
      assert(seen.size == 4)
      assert(c.groupOffsets.get(("cg2", "t", 0)) == 3L)
    }
  }

  // --- transactional isolation (kafka.isolation.level) ----------------------

  private val readCommitted = Map("kafka.isolation.level" -> "read_committed")

  test("read_committed hides open transactions; commit releases the rows") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "d0", "k" -> "d1"))                    // 0-1 settled
      c.appendTransactional("t", 0, 9L, Seq("k" -> "tx0", "k" -> "tx1")) // 2-3 OPEN
      // read_uncommitted (the default) sees everything, open txn included
      assert(readBatch(brokerList(c), "t").collect().map(valueStr).sorted.toSeq ==
        Seq("d0", "d1", "tx0", "tx1"))
      // read_committed plans against the LSO → only the settled prefix
      assert(readBatch(brokerList(c), "t", readCommitted).collect()
        .map(valueStr).toSeq == Seq("d0", "d1"))
      // the COMMIT marker settles the txn: rows flow; the marker itself
      // emits no row but its offset is accounted for
      c.endTxn("t", 0, 9L, commit = true)
      val rows = readBatch(brokerList(c), "t", readCommitted).collect()
        .sortBy(_.getLong(4))
      assert(rows.map(valueStr).toSeq == Seq("d0", "d1", "tx0", "tx1"))
      assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 1L, 2L, 3L))
    }
  }

  test("aborted transactions are invisible under read_committed, visible under read_uncommitted") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.appendTransactional("t", 0, 7L, Seq("k" -> "bad0", "k" -> "bad1")) // 0-1
      c.append("t", 0, Seq("k" -> "good2"))                                // 2 interleaved
      c.endTxn("t", 0, 7L, commit = false)                                 // 3 ABORT
      c.append("t", 0, Seq("k" -> "good4"))                                // 4
      val rows = readBatch(brokerList(c), "t", readCommitted).collect()
        .sortBy(_.getLong(4))
      assert(rows.map(valueStr).toSeq == Seq("good2", "good4"),
        "aborted rows filtered; interleaved non-transactional rows kept")
      assert(rows.map(_.getLong(4)).toSeq == Seq(2L, 4L))
      // the same log under read_uncommitted surfaces the aborted rows
      assert(readBatch(brokerList(c), "t").collect().map(valueStr).sorted.toSeq ==
        Seq("bad0", "bad1", "good2", "good4"))
    }
  }

  test("interleaved producers: only the committed producer's rows survive read_committed") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.appendTransactional("t", 0, 1L, Seq("k" -> "a0")) // 0, producer 1 (will abort)
      c.appendTransactional("t", 0, 2L, Seq("k" -> "b1")) // 1, producer 2 (will commit)
      c.appendTransactional("t", 0, 1L, Seq("k" -> "a2")) // 2, producer 1 again
      c.endTxn("t", 0, 1L, commit = false)                // 3 ABORT(p1)
      c.endTxn("t", 0, 2L, commit = true)                 // 4 COMMIT(p2)
      val rows = readBatch(brokerList(c), "t", readCommitted).collect()
      assert(rows.map(valueStr).toSeq == Seq("b1"))
      assert(rows.map(_.getLong(4)).toSeq == Seq(1L))
    }
  }

  test("streaming read_committed: the LSO gates admission; commit releases buffered rows") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "s0"))                // 0
      c.appendTransactional("t", 0, 5L, Seq("k" -> "tx")) // 1 OPEN
      val ckpt = tempDir("readcommitted")
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", ckpt, seen, readCommitted)
      assert(seen.asScala.map(_._4).toSeq == Seq("s0"),
        "rows behind an open transaction must not flow")
      c.endTxn("t", 0, 5L, commit = true)               // 2 COMMIT
      c.append("t", 0, Seq("k" -> "s3"))                // 3
      runStream(brokerList(c), "t", ckpt, seen, readCommitted)
      assert(seen.asScala.map(_._4).toSeq.sorted == Seq("s0", "s3", "tx"))
      // offsets line up with the log: the control marker produced no row
      // but its offset (2) was stepped over, not replanned
      assert(seen.asScala.map(_._3).toSeq.sorted == Seq(0L, 1L, 3L))
    }
  }

  // --- timestamp-based offset bounds ----------------------------------------

  test("startingTimestamp/endingTimestamp: batch replay window from wall-clock points") {
    withCluster() { c =>
      c.addPartition("t", 0)
      // offsets 0-4 at t=1000,2000,...,5000
      (0 until 5).foreach(i =>
        c.append("t", 0, Seq(s"k$i" -> s"v$i"), timestampMs = 1000L * (i + 1)))
      // start at-or-after 2500ms → first match is offset 2 (t=3000)
      val from = readBatch(brokerList(c), "t", Map("startingTimestamp" -> "2500"))
        .collect().sortBy(_.getLong(4))
      assert(from.map(valueStr).toSeq == Seq("v2", "v3", "v4"))
      // window [2000ms, 4000ms): ending bound is the first offset >= 4000 — EXCLUSIVE
      val window = readBatch(brokerList(c), "t",
        Map("startingTimestamp" -> "2000", "endingTimestamp" -> "4000"))
        .collect().sortBy(_.getLong(4))
      assert(window.map(valueStr).toSeq == Seq("v1", "v2"))
      // an end time past the newest record means "everything from start"
      val openEnd = readBatch(brokerList(c), "t",
        Map("startingTimestamp" -> "4500", "endingTimestamp" -> "99999"))
        .collect()
      assert(openEnd.map(valueStr).toSeq == Seq("v4"))
    }
  }

  test("startingOffsetsByTimestamp: per-partition times; no-match follows the strategy") {
    withCluster() { c =>
      c.addPartition("t", 0); c.addPartition("t", 1)
      (0 until 4).foreach(i =>
        c.append("t", 0, Seq(s"k$i" -> s"p0-$i"), timestampMs = 1000L * (i + 1)))
      c.append("t", 1, Seq("k" -> "p1-0"), timestampMs = 500L)
      // p0 from 3000ms (offset 2); p1 absent from the JSON → earliest
      val rows = readBatch(brokerList(c), "t",
        Map("startingOffsetsByTimestamp" -> """{"t":{"0":3000}}""")).collect()
      assert(rows.map(valueStr).toSet == Set("p0-2", "p0-3", "p1-0"))
      // a start time past p0's newest record: loud by default...
      val ex = intercept[Exception] {
        readBatch(brokerList(c), "t",
          Map("startingOffsetsByTimestamp" -> """{"t":{"0":9999}}""")).collect()
      }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("no record at-or-after"), msgs)
      // ...strategy=latest starts those partitions at the log end instead
      val lenient = readBatch(brokerList(c), "t", Map(
        "startingOffsetsByTimestamp" -> """{"t":{"0":9999,"1":0}}""",
        "startingOffsetsByTimestampStrategy" -> "latest")).collect()
      assert(lenient.map(valueStr).toSeq == Seq("p1-0"))
    }
  }

  test("streaming startingTimestamp: backlog before the requested time never flows") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "old"), timestampMs = 1000L)
      c.append("t", 0, Seq("k" -> "new0", "k" -> "new1"), timestampMs = 5000L)
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      runStream(brokerList(c), "t", tempDir("startts"), seen,
        Map("startingTimestamp" -> "5000"))
      assert(seen.asScala.map(_._4).toSeq.sorted == Seq("new0", "new1"))
    }
  }

  test("timestamp bound options: conflicting replay points are config errors") {
    val base = Map("brokers" -> "h:1", "topic" -> "t")
    // two start specs
    assertThrows[IllegalArgumentException](KafkaWireSource.timestampBoundOptions(
      Map("startingoffsets" -> "earliest", "startingtimestamp" -> "1000")))
    // global + per-partition timestamps
    assertThrows[IllegalArgumentException](KafkaWireSource.resolveTimestamps(
      Some(1L), Some("{}"), Nil, (_, _) => Map.empty, errorOnNoMatch = true,
      defaultLatest = false))
    // bad strategy spelling
    assertThrows[IllegalArgumentException](KafkaWireSource.timestampBoundOptions(
      Map("startingoffsetsbytimestampstrategy" -> "whatever")))
    // batch: endingOffsets + endingTimestamp
    withCluster() { c =>
      c.addPartition("t", 0)
      assertThrows[IllegalArgumentException](readBatch(brokerList(c), "t",
        Map("endingOffsets" -> "latest", "endingTimestamp" -> "1")).collect())
    }
    base.size // silence unused warning
    ()
  }

  test("Trigger.AvailableNow: bounded catch-up drains the backlog in capped batches, then stops") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, (0 until 20).map(i => s"k$i" -> s"v$i"))
      val ckpt = tempDir("availnow")
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      def runAvailableNow(): Int = {
        val src = spark.readStream.format("graft-kafka")
          .option("brokers", brokerList(c)).option("topic", "t")
          .option("maxOffsetsPerTrigger", "7").load()
        val q = src.writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: DataFrame, id: Long) =>
            df.selectExpr("partition", "offset", "cast(value as string) as v").collect()
              .foreach(r => seen.add((id, r.getInt(0), r.getLong(1), r.getString(2))))
          }.start()
        // AvailableNow terminates ITSELF once the captured end is reached
        assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
        seen.asScala.map(_._1).toSet.size
      }
      val batches = runAvailableNow()
      assert(seen.size == 20)
      assert(batches >= 3, s"a 7-row cap over 20 rows needs >=3 micro-batches, got $batches")
      // rows appended after termination wait for the NEXT run...
      c.append("t", 0, Seq("k" -> "late0", "k" -> "late1"))
      assert(seen.size == 20)
      // ...which resumes from the checkpoint and reads exactly them
      runAvailableNow()
      assert(seen.asScala.map(_._4).toSeq.sorted ==
        ((0 until 20).map(i => s"v$i") ++ Seq("late0", "late1")).sorted)
      assert(seen.asScala.map(t => (t._2, t._3)).toSeq.distinct.size == 22)
    }
  }

  test("corrupt or foreign checkpoint offset JSON fails loudly, never restarts from earliest") {
    withCluster() { c =>
      c.addPartition("t", 0)
      val stream = new KafkaWireMicroBatchStream(Map(
        "brokers" -> brokerList(c), "topic" -> "t"))
      try {
        assert(stream.deserializeOffset("""{"t":{"0":5}}""")
          .asInstanceOf[KafkaWireOffset].offsets == Map(("t", 0) -> 5L))
        assert(stream.deserializeOffset("{}")
          .asInstanceOf[KafkaWireOffset].offsets.isEmpty)
        // the legacy FLAT shape this source itself wrote pre-nesting: a
        // single-topic stream migrates it (upgrades must not strand a
        // checkpoint), instead of failing the restart
        assert(stream.deserializeOffset("""{"0":12,"7":3}""")
          .asInstanceOf[KafkaWireOffset].offsets ==
          Map(("t", 0) -> 12L, ("t", 7) -> 3L))
        // any genuinely foreign format: silently restarting every partition
        // from earliest would flood downstream with dups
        assertThrows[IllegalArgumentException](stream.deserializeOffset("v2:garbage"))
        assertThrows[IllegalArgumentException](
          stream.deserializeOffset("""{"a":"b"}"""))
      } finally stream.stop()
      // the flat migration needs an unambiguous topic: a multi-topic stream
      // cannot guess which topic the bare partitions belonged to
      val multi = new KafkaWireMicroBatchStream(Map(
        "brokers" -> brokerList(c), "topics" -> "t,u"))
      try assertThrows[IllegalArgumentException](
        multi.deserializeOffset("""{"0":12}"""))
      finally multi.stop()
    }
  }

  test("maxOffsetsPerTrigger never overflows on astronomically deep lag") {
    withCluster() { c =>
      val log = c.addPartition("t", 0)
      log.logStart = 5000000000000L // log spans [5e12, 5e12): lag vs start 0 is 5e12
      val stream = new KafkaWireMicroBatchStream(Map(
        "brokers" -> brokerList(c), "topic" -> "t"))
      try {
        val end = stream.latestOffset(KafkaWireOffset(Map(("t", 0) -> 0L)),
          org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(10000000L))
        // cap(1e7) × lag(5e12) overflows a Long multiply; the share must
        // still be the cap, never a negative cursor regression
        assert(KafkaWireSource.offsetsFromJson(end.json()) == Map(("t", 0) -> 10000000L))
      } finally stream.stop()
    }
  }

  test("subscribePattern never sweeps in internal topics; user __ topics still match") {
    withCluster() { c =>
      c.addPartition("__consumer_offsets", 0)
      c.addPartition("__transaction_state", 0)
      c.addPartition("__my_user_topic", 0)
      c.addPartition("events.a", 0)
      c.append("__consumer_offsets", 0, Seq("g" -> "binarybookkeeping"))
      c.append("__transaction_state", 0, Seq("g" -> "binarybookkeeping"))
      c.append("__my_user_topic", 0, Seq("k" -> "userdata"))
      c.append("events.a", 0, Seq("k" -> "real"))
      val rows = spark.read.format("graft-kafka")
        .option("brokers", brokerList(c))
        .option("subscribePattern", ".*").load().collect()
      // exclusion is by KNOWN internal names: a user topic that merely
      // starts with "__" is real data and must not be silently dropped
      assert(rows.map(valueStr).toSeq.sorted == Seq("real", "userdata"),
        "broad pattern: internal topics excluded, __-prefixed user topics kept")
    }
  }

  test("failOnDataLoss=false survives log-END truncation (unclean leader election)") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, (0 until 4).map(i => s"k$i" -> s"v$i")) // 0-3
      c.append("t", 0, (4 until 8).map(i => s"k$i" -> s"v$i")) // 4-7
      c.truncateEndTo("t", 0, 4) // election rolled the log end back to 4
      val b = c.brokerList.head
      // checkpoint says resume at 6 — beyond the surviving log
      def reader(fdl: Boolean) = KafkaWireReaderFactory.createReader(
        KafkaWirePartition(b.host, b.port, "t", 0, 6L, 8L, None, failOnDataLoss = fdl))
      val r1 = reader(fdl = true)
      val ex = intercept[java.io.IOException](r1.next())
      assert(ex.getMessage.contains("failOnDataLoss"), ex.getMessage)
      r1.close()
      // fdl=false: acknowledge the truncated tail and terminate cleanly
      // instead of killing the query
      val r2 = reader(fdl = false)
      val got = Seq.newBuilder[Long]
      while (r2.next()) got += r2.get().getLong(4)
      r2.close()
      assert(got.result().isEmpty, "offsets 6-7 are gone; survival means empty, not a crash")
    }
  }

  test("ending bounds are rejected in streaming mode, not silently ignored") {
    withCluster() { c =>
      c.addPartition("t", 0)
      for (opt <- Seq("endingOffsets" -> "latest", "endingTimestamp" -> "99",
        "endingOffsetsByTimestamp" -> """{"t":{"0":99}}""")) {
        val ex = intercept[Exception] {
          val q = spark.readStream.format("graft-kafka")
            .option("brokers", brokerList(c)).option("topic", "t")
            .option(opt._1, opt._2).load()
            .writeStream.format("memory").queryName(s"bad_${opt._1}")
            .option("checkpointLocation", tempDir("endingreject")).start()
          try q.processAllAvailable() finally q.stop()
        }
        val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
        assert(msgs.contains("not valid in streaming"), s"${opt._1}: $msgs")
      }
    }
  }

  test("AvailableNow snapshot below a later-resolved start never regresses the offset") {
    withCluster() { c =>
      c.addPartition("t", 0)
      c.append("t", 0, Seq("k" -> "pre0", "k" -> "pre1"))
      // prepare() runs BEFORE initialOffset in Spark's AvailableNow path;
      // rows appended between the two put a startingOffsets=latest start
      // PAST the snapshot — the planned end must clamp up to the start
      val stream = new KafkaWireMicroBatchStream(Map(
        "brokers" -> brokerList(c), "topic" -> "t", "startingoffsets" -> "latest"))
      try {
        stream.prepareForTriggerAvailableNow() // snapshot end = 2
        c.append("t", 0, Seq("k" -> "mid0", "k" -> "mid1", "k" -> "mid2"))
        val start = stream.initialOffset() // latest = 5
        val end = stream.latestOffset(start,
          org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
        assert(KafkaWireSource.offsetsFromJson(end.json()) == Map(("t", 0) -> 5L),
          "end clamps UP to the start; 2 < 5 would regress the checkpoint")
        assert(stream.planInputPartitions(start, end).isEmpty,
          "no batch: the start bound already excluded the snapshot rows")
      } finally stream.stop()
    }
  }

  test("soak: concurrent appends + leadership flaps + restarts deliver exactly once") {
    withCluster(brokers = 2) { c =>
      val log0 = c.addPartition("t", 0, leader = 0)
      val log1 = c.addPartition("t", 1, leader = 1)
      val perPartition = 150
      @volatile var writerDone = false
      val writer = new Thread(() => {
        (0 until perPartition).foreach { i =>
          c.append("t", 0, Seq(s"k$i" -> s"p0-$i"))
          c.append("t", 1, Seq(s"k$i" -> s"p1-$i"))
          // leadership moves WHILE the query reads: readers must follow
          // via metadata, planners must re-resolve per batch
          if (i % 20 == 10) { log0.leader = 1 - log0.leader; log1.leader = 1 - log1.leader }
          if (i % 5 == 0) Thread.sleep(1)
        }
        writerDone = true
      }, "soak-writer")
      val ckpt = tempDir("soak")
      val seen = new ConcurrentLinkedQueue[(Long, Int, Long, String)]
      writer.start()
      // several bounded runs RACING the writer — each restart recovers from
      // the checkpoint mid-stream; small triggers force many micro-batches
      var runs = 0
      while (!writerDone || runs < 2) {
        runStream(brokerList(c), "t", ckpt, seen, Map("maxOffsetsPerTrigger" -> "37"))
        runs += 1
      }
      writer.join()
      runStream(brokerList(c), "t", ckpt, seen, Map("maxOffsetsPerTrigger" -> "37"))
      val all = seen.asScala.toSeq
      val expected = (0 until perPartition).flatMap(i => Seq(s"p0-$i", s"p1-$i")).toSet
      assert(all.map(t => (t._2, t._3)).distinct.size == all.size,
        s"duplicate (partition, offset) deliveries in ${all.size} rows")
      assert(all.map(_._4).toSet == expected,
        s"got ${all.size} rows over $runs+1 runs; missing " +
          (expected -- all.map(_._4).toSet).take(5).mkString(", "))
    }
  }

  test("isolation.level option: stock spellings parse; nonsense is loud") {
    val base = Map("brokers" -> "h:1", "topic" -> "t")
    assert(KafkaWireSource.parseOptions(base).isolation == 0)
    assert(KafkaWireSource.parseOptions(
      base + ("kafka.isolation.level" -> "read_committed")).isolation == 1)
    assert(KafkaWireSource.parseOptions(
      base + ("isolation.level" -> "read_uncommitted")).isolation == 0)
    assertThrows[IllegalArgumentException](
      KafkaWireSource.parseOptions(base + ("isolation.level" -> "serializable")))
  }
}
