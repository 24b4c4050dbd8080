package graft.sources.kafka

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** The WRITE side of `format("graft-kafka")` — a Kafka producer speaking
  * Produce v3 over [[WireClient]], with the stock Kafka SINK's column
  * contract: `value` (binary/string, required), optional `key`
  * (binary/string), optional `topic` (string — required unless the `topic`
  * option names one), optional `partition` (int), optional `headers`
  * (array<struct<key:string,value:binary>>). Partitionless rows route by
  * murmur-style key hash (keyed rows stay ordered per key, the semantics
  * compaction and downstream dedup rely on) or round-robin when keyless.
  *
  * Scale shape: each Spark task buffers records PER (topic, partition) and
  * produces one record batch per flush DIRECTLY TO THAT PARTITION'S LEADER
  * (metadata resolved once on the driver, shipped to tasks) — writes
  * parallelize by Spark partition with no driver involvement, and a flush
  * threshold bounds task memory. Delivery is at-least-once by default:
  * batches flush on commit; a task retry re-produces its rows (Kafka's own
  * producer contract without idempotence enabled). `enable.idempotence`
  * adds broker-side sequence dedup for network-level retries;
  * `transactional.id` wraps each task's rows in one transaction (committed
  * at task commit, aborted at task abort), so read_committed consumers
  * never see rows from failed or speculative task attempts. */
private[kafka] final class KafkaWireWriteBuilder(opts: Map[String, String],
                                                 info: LogicalWriteInfo)
  extends WriteBuilder {
  override def build(): Write = new KafkaWireWrite(opts, info.schema())
}

private[kafka] final class KafkaWireWrite(opts: Map[String, String], schema: StructType)
  extends Write {

  /** Driver-side plan: resolve leaders + partition counts once; tasks get
    * plain serializable maps. */
  private def plan(): KafkaWireWriterFactory = {
    val o = KafkaWireSource.parseOptions(opts +
      // the write side tolerates a missing topic option when every row
      // carries a topic column — parseOptions demands SOME topic source,
      // so feed it a placeholder that is never used for routing
      ("topic" -> opts.collectFirst {
        case (k, v) if Set("topic", "topics", "subscribe")(k.toLowerCase) => v
      }.getOrElse("__graft_dynamic")))
    val defaultTopic = opts.collectFirst {
      case (k, v) if k.toLowerCase == "topic" => v.split(',').head.trim
    }
    // was ANY topic source declared? (defaultTopic alone misses topics/
    // subscribe spellings, and the placeholder must NEVER reach a broker —
    // a cluster with topic auto-create would mint a junk __graft_dynamic
    // topic on every dynamic write)
    val declared = opts.keys.exists(k => Set("topic", "topics", "subscribe")(k.toLowerCase))
    val client = KafkaWireSource.connectControl(o)
    val meta = try {
      // dynamic-topic writes discover leaders lazily per task; a declared
      // topic resolves now so misconfiguration fails on the driver
      if (!declared) None else Some(client.metadata(o.topics))
    } finally client.close()
    // a typo'd topic on a no-auto-create cluster answers error 3 with zero
    // partitions — fail HERE, not as floorMod-by-zero on an executor
    meta.foreach(_.topics.filter(_.errorCode != 0).foreach(t =>
      throw new java.io.IOException(
        s"graft-kafka writer: metadata error ${t.errorCode} for topic ${t.name}")))
    val leaders: Map[(String, Int), (String, Int)] = meta match {
      case None => Map.empty
      case Some(m) => KafkaWireSource.leaderEndpoints(m, o.endpoint)
        .map { case (tp, ep) => tp -> (ep.host, ep.port) }
    }
    val counts: Map[String, Int] = meta match {
      case None => Map.empty
      case Some(m) => m.topics.map(t => t.name -> t.partitions.size).toMap
    }
    new KafkaWireWriterFactory(schema, defaultTopic.filterNot(_ == "__graft_dynamic"),
      o.endpoints.map(e => (e.host, e.port)), leaders, counts, o.sasl, o.tls,
      flushRecords = opts.collectFirst {
        case (k, v) if k.toLowerCase == "flush.records" => v.toInt
      }.getOrElse(16 * 1024),
      // producer-config spelling compression.type (kafka.-prefixed or bare):
      // the records block of every produced batch is compressed AS ONE UNIT
      // with the named codec — bytes on the wire and in the broker's log
      // shrink together, the lever that matters on a 100 TB egress
      codec = opts.collectFirst {
        case (k, v) if Set("kafka.compression.type", "compression.type")(k.toLowerCase) => v
      }.map {
        case "none" => Records.CodecNone
        case "gzip" => Records.CodecGzip
        case "snappy" => Records.CodecSnappy
        case "lz4" => Records.CodecLz4
        case "zstd" => Records.CodecZstd
        case other => throw new IllegalArgumentException(
          s"graft-kafka writer: compression.type must be none/gzip/snappy/lz4/zstd, got '$other'")
      }.getOrElse(Records.CodecNone),
      // producer-config spelling enable.idempotence: each task claims a
      // broker-assigned producer id and stamps batches with per-partition
      // sequence numbers, so a RETRY of a delivered-but-unacked batch is
      // deduplicated broker-side instead of doubling rows
      idempotent = opts.collectFirst {
        case (k, v) if Set("kafka.enable.idempotence", "enable.idempotence")(k.toLowerCase) =>
          v.trim.toBoolean
      }.getOrElse(false),
      // producer-config spelling transactional.id: each task wraps its rows
      // in ONE transaction committed at task commit and aborted at task
      // abort — so failed/speculative task attempts never surface rows to
      // read_committed consumers (task-retry dedup beyond what sequence
      // numbers cover)
      transactionalId = opts.collectFirst {
        case (k, v) if Set("kafka.transactional.id", "transactional.id")(k.toLowerCase) => v
      },
      // producer-config spelling transaction.timeout.ms: how long the
      // coordinator lets a transaction stay open before proactively
      // aborting it — must exceed the longest task's flush-to-commit span
      // (stock producer default 60 s)
      txnTimeoutMs = opts.collectFirst {
        case (k, v) if Set("kafka.transaction.timeout.ms", "transaction.timeout.ms")(k.toLowerCase) =>
          v.trim.toInt
      }.getOrElse(60000))
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val factory = plan()
    override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory = factory
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    private val factory = plan()
    override def createStreamingWriterFactory(pi: PhysicalWriteInfo): StreamingDataWriterFactory = factory
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

private[kafka] final case class KafkaWriteDone(records: Long)
  extends WriterCommitMessage

private[kafka] object KafkaWireWriter {
  /** Kafka's default partitioner hash (murmur2 with seed 0x9747b28c, the
    * public-domain algorithm the stock Java client ships): keyed rows must
    * land on the SAME partition as records from any stock producer, or
    * co-partitioning, compaction key-locality, and downstream per-key dedup
    * silently break on shared topics. */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    // handle the tail (fall-through cases of the original switch)
    val tail = length % 4
    if (tail >= 3) h ^= (data((length & ~3) + 2) & 0xff) << 16
    if (tail >= 2) h ^= (data((length & ~3) + 1) & 0xff) << 8
    if (tail >= 1) { h ^= data(length & ~3) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }
}

/** Serializable task-side factory: everything is strings/ints. */
private[kafka] final class KafkaWireWriterFactory(
    schema: StructType,
    defaultTopic: Option[String],
    controlEndpoints: Seq[(String, Int)],
    leaders: Map[(String, Int), (String, Int)],
    partitionCounts: Map[String, Int],
    sasl: Option[WireClient.SaslConfig],
    tls: Option[WireClient.TlsConfig],
    flushRecords: Int,
    codec: Int = Records.CodecNone,
    idempotent: Boolean = false,
    transactionalId: Option[String] = None,
    txnTimeoutMs: Int = 60000)
  extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KafkaWireDataWriter(schema, defaultTopic, controlEndpoints, leaders,
      partitionCounts, sasl, tls, flushRecords, codec, idempotent,
      // per-task transactional id — two tasks sharing one id would fence
      // each other; suffixing by task identity is the standard pattern
      transactionalId.map(base => s"$base-$partitionId-$taskId"), txnTimeoutMs)

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)
}

private[kafka] final class KafkaWireDataWriter(
    schema: StructType,
    defaultTopic: Option[String],
    controlEndpoints: Seq[(String, Int)],
    var leaders: Map[(String, Int), (String, Int)],
    var partitionCounts: Map[String, Int],
    sasl: Option[WireClient.SaslConfig],
    tls: Option[WireClient.TlsConfig],
    flushRecords: Int,
    codec: Int = Records.CodecNone,
    idempotent: Boolean = false,
    transactionalId: Option[String] = None,
    txnTimeoutMs: Int = 60000)
  extends DataWriter[InternalRow] {

  private def transactional: Boolean = transactionalId.isDefined

  private def idx(name: String): Int = schema.fieldNames.indexOf(name)
  private val valueIdx = {
    val i = idx("value")
    require(i >= 0, "graft-kafka writer: a 'value' column is required")
    i
  }
  private val keyIdx = idx("key")
  private val topicIdx = idx("topic")
  private val partitionIdx = idx("partition")
  private val headersIdx = idx("headers")
  require(topicIdx >= 0 || defaultTopic.isDefined,
    "graft-kafka writer: set the 'topic' option or provide a topic column")

  private def binaryAt(row: InternalRow, i: Int): Array[Byte] =
    if (i < 0 || row.isNullAt(i)) null
    else schema(i).dataType match {
      case BinaryType => row.getBinary(i)
      case StringType => row.getUTF8String(i).getBytes
      case other => throw new IllegalArgumentException(
        s"graft-kafka writer: column ${schema(i).name} must be binary or string, got $other")
    }

  private val buffers = mutable.Map[(String, Int), mutable.ArrayBuffer[Records.Record]]()
  private val clients = mutable.Map[(String, Int), WireClient]()
  private var written = 0L
  private var roundRobin = 0

  /** Idempotence state: one broker-assigned producer id per task (claimed
    * lazily on the first flush — exactly a Kafka producer's lifecycle) and
    * a per-partition sequence counter bumped only AFTER a successful
    * produce, so the NotLeader retry below re-sends the SAME sequence and
    * the broker can recognize a duplicate. */
  private var producerId = -1L
  private var producerEpoch = 0
  private val nextSeq = mutable.Map[(String, Int), Int]()
  /** Partitions declared to the transaction coordinator (txn mode only). */
  private val txnDeclared = mutable.Set[(String, Int)]()

  /** Transactional RPCs go to the TRANSACTION COORDINATOR for this
    * transactional.id (any other broker answers NOT_COORDINATOR), found
    * via FindCoordinator key_type=1 — the same ask-then-go contract the
    * group-offset path follows. Idempotence-only producers can init
    * anywhere. */
  private def txnClient(): WireClient = transactionalId match {
    case None => controlClient()
    case Some(txnId) =>
      val coord = controlClient().findTxnCoordinator(txnId)
      clientFor((coord.host, coord.port))
  }

  private def claimProducerId(): Long = {
    if (producerId < 0) {
      val (pid, epoch) = txnClient()
        .initProducerId(timeoutMs = txnTimeoutMs, transactionalId = transactionalId.orNull)
      producerId = pid
      // the broker BUMPS the epoch when a transactional.id is reused; every
      // batch and txn RPC must carry the assigned epoch or be fenced
      producerEpoch = epoch
    }
    producerId
  }

  private def clientFor(ep: (String, Int)): WireClient =
    clients.getOrElseUpdate(ep, new WireClient(ep._1, ep._2, sasl = sasl, tls = tls))

  /** Control-plane client with FAILOVER across the brokers list (the read
    * side's connectControl contract): a dead first broker must not kill a
    * write that has healthy brokers left. */
  private def controlClient(): WireClient = {
    var last: Throwable = null
    controlEndpoints.foreach { ep =>
      try return clientFor(ep)
      catch { case t: java.io.IOException => clients.remove(ep); last = t }
    }
    throw new java.io.IOException(
      s"graft-kafka writer: no broker reachable among ${controlEndpoints.mkString(",")}", last)
  }

  /** Refresh partition counts + leader endpoints for `topic` from a live
    * metadata response — one shared mapping (KafkaWireSource.leaderEndpoints)
    * instead of per-call-site copies of the byId/fallback logic. */
  private def refreshTopic(topic: String): Unit = {
    val meta = controlClient().metadata(topic)
    if (meta.topic.errorCode != 0)
      throw new java.io.IOException(
        s"graft-kafka writer: metadata error ${meta.topic.errorCode} for topic $topic")
    partitionCounts += topic -> meta.topic.partitions.size
    val fallback = KafkaWireSource.Endpoint(controlEndpoints.head._1, controlEndpoints.head._2)
    leaders ++= KafkaWireSource.leaderEndpoints(meta, fallback)
      .map { case (tp, ep) => tp -> (ep.host, ep.port) }
  }

  /** Partition counts / leaders for a topic first seen in a `topic` column:
    * one control-plane metadata call, cached for the task's lifetime. */
  private def ensureTopic(topic: String): Unit =
    if (!partitionCounts.contains(topic)) refreshTopic(topic)

  override def write(row: InternalRow): Unit = {
    val topic =
      if (topicIdx >= 0 && !row.isNullAt(topicIdx)) row.getUTF8String(topicIdx).toString
      else defaultTopic.getOrElse(
        throw new IllegalArgumentException("graft-kafka writer: null topic and no topic option"))
    ensureTopic(topic)
    val n = partitionCounts(topic)
    val key = binaryAt(row, keyIdx)
    val part =
      if (partitionIdx >= 0 && !row.isNullAt(partitionIdx)) row.getInt(partitionIdx)
      else if (key != null) (KafkaWireWriter.murmur2(key) & 0x7fffffff) % n
      else { roundRobin += 1; math.floorMod(roundRobin, n) }
    require(part >= 0 && part < n,
      s"graft-kafka writer: partition $part out of range for $topic ($n partitions)")
    val headers: Seq[(String, Array[Byte])] =
      if (headersIdx < 0 || row.isNullAt(headersIdx)) Nil
      else {
        val arr = row.getArray(headersIdx)
        (0 until arr.numElements()).map { i =>
          val h = arr.getStruct(i, 2)
          h.getUTF8String(0).toString -> (if (h.isNullAt(1)) null else h.getBinary(1))
        }
      }
    val buf = buffers.getOrElseUpdate((topic, part), mutable.ArrayBuffer.empty)
    buf += Records.Record(buf.size.toLong, System.currentTimeMillis(),
      key, binaryAt(row, valueIdx), headers = headers)
    written += 1
    if (buf.size >= flushRecords) flush(topic, part)
  }

  private def flush(topic: String, part: Int): Unit = {
    val buf = buffers((topic, part))
    if (buf.nonEmpty) {
      val (pid, seq) =
        if (!idempotent && !transactional) (-1L, -1)
        else (claimProducerId(), nextSeq.getOrElse((topic, part), 0))
      // first produce to a partition inside a transaction: declare it, so
      // EndTxn knows where its markers go
      if (transactional && !txnDeclared((topic, part))) {
        txnClient().addPartitionsToTxn(
          transactionalId.get, pid, producerEpoch, topic, Seq(part))
        txnDeclared += ((topic, part))
      }
      val leader = leaders.getOrElse((topic, part), controlEndpoints.head)
      // no producer id claimed → the batch must carry NO_PRODUCER_EPOCH (-1),
      // not this field's initial 0; Int.MinValue defers to encodeBatch's
      // pid<0 default
      val epoch = if (pid < 0) Int.MinValue else producerEpoch
      try clientFor(leader).produce(topic, part, buf.toSeq, codec = codec,
        producerId = pid, baseSequence = seq,
        transactionalId = transactionalId.orNull, producerEpoch = epoch)
      catch {
        // NOT_LEADER: leadership moved since the driver resolved it (or
        // since this task cached it). Refresh from the control plane and
        // retry ONCE at the new leader — the stock producer's
        // metadata-refresh-on-error behavior; a second failure is real.
        // Under idempotence the retry carries the SAME sequence, so a
        // batch the old leader already replicated is deduplicated, not
        // doubled.
        case _: WireClient.NotLeader =>
          clients.remove(leader).foreach(c => try c.close() catch { case _: Throwable => () })
          refreshTopic(topic)
          val fresh = leaders.getOrElse((topic, part), controlEndpoints.head)
          clientFor(fresh).produce(topic, part, buf.toSeq, codec = codec,
            producerId = pid, baseSequence = seq,
            transactionalId = transactionalId.orNull, producerEpoch = epoch)
      }
      if (idempotent || transactional) nextSeq((topic, part)) = seq + buf.size
      buf.clear()
    }
  }

  override def commit(): WriterCommitMessage = {
    buffers.keys.toSeq.foreach { case (t, p) => flush(t, p) }
    // the task's transaction commits as ONE unit: only now do
    // read_committed consumers see any of its rows
    if (transactional && producerId >= 0)
      txnClient().endTxn(transactionalId.get, producerId, producerEpoch, commit = true)
    KafkaWriteDone(written)
  }

  override def abort(): Unit = {
    buffers.clear()
    // batches already flushed mid-task are in the log — the ABORT marker
    // is what keeps them invisible to read_committed consumers
    if (transactional && producerId >= 0)
      try txnClient().endTxn(transactionalId.get, producerId, producerEpoch, commit = false)
      catch { case _: Throwable => () } // abort path must not mask the task error
  }

  override def close(): Unit = {
    clients.values.foreach(c => try c.close() catch { case _: Throwable => () })
    clients.clear()
  }
}
