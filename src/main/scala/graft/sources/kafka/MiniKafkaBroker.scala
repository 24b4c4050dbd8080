package graft.sources.kafka

import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** In-process Kafka broker speaking exactly the protocol slice
  * [[WireClient]] consumes — ApiVersions v0, Metadata v1, ListOffsets v1,
  * Fetch v4, SaslHandshake v1, SaslAuthenticate v0 — over a REAL
  * ServerSocket, so the DataSource V2 path (offset planning → leader
  * routing → fetch loop → CRC'd record batches → checkpoint commit) is
  * driven end-to-end without a container. Several brokers can share one
  * [[MiniKafkaBroker.Cluster]]: each answers Metadata with the full broker
  * list but serves Fetch ONLY for partitions it leads (error 6 otherwise),
  * which is how the leader-routing test catches a client that fetches
  * from the control broker.
  *
  * Lives in main (testkit role, like Spark's MemoryStream): it is the
  * fixture behind the kafka-wire test suites AND the loopback broker for
  * [[graft.WireIngestBench]], which needs it on the bench classpath.
  * Synthetic partitions ([[Cluster.addSyntheticPartition]]) generate their
  * record batches ON DEMAND from a deterministic function of the offset,
  * so a bench topic can be arbitrarily deep with O(1) broker memory.
  */
object MiniKafkaBroker {

  /** One appended record batch: pre-encoded wire bytes + offset span.
    * `lastOffset` can exceed the last record's offset (compaction). */
  final case class LogBatch(baseOffset: Long, lastOffset: Long, bytes: Array[Byte])

  final class PartitionLog(@volatile var leader: Int) {
    val batches = mutable.ArrayBuffer[LogBatch]()
    @volatile var logStart = 0L
    /** Synthetic log: (recordCount, batchSize, gen(offset) => (key, value)).
      * When set, fetches ENCODE batches on demand from the generator
      * instead of reading [[batches]] — O(1) memory at any depth. */
    @volatile var synthetic: Option[(Long, Int, Long => (String, String))] = None
    /** producerId → first offset of its OPEN transaction. */
    val openTxns = mutable.Map[Long, Long]()
    /** Completed ABORTED transactions: (producerId, firstOffset), the
      * fetch-response aborted_transactions source. */
    val abortedTxns = mutable.ArrayBuffer[(Long, Long)]()
    /** Idempotent-producer state: producerId → (nextExpectedSeq,
      * lastAcceptedSeq, baseOffset answered for it) — enough to dedup an
      * exact retry of the last batch and reject sequence gaps. */
    val producerSeqs = mutable.Map[Long, (Int, Int, Long)]()
    def logEnd: Long = synchronized {
      synthetic.map(_._1).getOrElse(
        batches.lastOption.map(_.lastOffset + 1).getOrElse(logStart))
    }
    /** Last stable offset: everything below it is transaction-settled —
      * the first offset of the earliest still-open transaction, or the
      * log end when none is open. */
    def lastStable: Long = synchronized {
      if (openTxns.isEmpty) logEnd else math.min(openTxns.values.min, logEnd)
    }
  }

  final case class SaslUser(username: String, password: String)

  /** Shared cluster state. Thread-safe enough for test use: appends and
    * reads synchronize on the partition log. */
  final class Cluster(val sasl: Option[SaslUser] = None) {
    /** When set, the SCRAM server-final `v=` signature is corrupted — models
      * a MITM that intercepted the exchange but does not know the password;
      * the client MUST reject the connection (WireClient.scala MITM check). */
    @volatile var tamperScramServerSignature: Boolean = false
    val topics = new java.util.concurrent.ConcurrentHashMap[String, mutable.Map[Int, PartitionLog]]()
    /** Consumer-group offset store: (group, topic, partition) → committed
      * offset. The FIRST broker coordinates every group (FindCoordinator);
      * commits on any other broker answer error 16 (NOT_COORDINATOR), so a
      * client that skips coordinator lookup is caught. */
    val groupOffsets = new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Long]()
    /** Codec ids (attributes bits 0-2) of every produced batch, in arrival
      * order — lets specs assert the producer actually compressed. */
    val producedCodecs = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    /** InitProducerId assignment counter. */
    val nextProducerId = new java.util.concurrent.atomic.AtomicLong(1000L)
    /** Open transactions: producerId → partitions declared via
      * AddPartitionsToTxn (where EndTxn writes its markers). */
    val txnPartitions = new java.util.concurrent.ConcurrentHashMap[Long, mutable.Set[(String, Int)]]()
    /** transactional.id → (producerId, epoch): InitProducerId REUSES the
      * pid for a known id and BUMPS the epoch — the fencing mechanism. */
    val txnIds = new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()
    /** producerId → current epoch; Produce/AddPartitions/EndTxn carrying a
      * lower epoch are fenced with error 47. */
    val producerEpochs = new java.util.concurrent.ConcurrentHashMap[Long, Int]()
    /** Last InitProducerId transaction_timeout_ms seen (spec observation). */
    @volatile var lastTxnTimeoutMs: Int = -1
    /** Topic names asked for via Metadata (spec observation: a client must
      * never leak internal placeholder names to the broker). */
    val metadataRequests = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val brokers = mutable.ArrayBuffer[MiniKafkaBroker]()

    def addBroker(tls: Option[javax.net.ssl.SSLContext] = None): MiniKafkaBroker = synchronized {
      val b = new MiniKafkaBroker(this, brokers.size, tls)
      brokers += b
      b
    }
    def brokerList: Seq[MiniKafkaBroker] = synchronized(brokers.toSeq)

    def addPartition(topic: String, partition: Int, leader: Int = 0): PartitionLog = {
      val parts = topics.computeIfAbsent(topic, _ => mutable.Map[Int, PartitionLog]())
      parts.synchronized {
        parts.getOrElseUpdate(partition, new PartitionLog(leader))
      }
    }

    /** Declare a SYNTHETIC partition of `records` rows: fetches encode
      * `batchSize`-record batches on demand from `gen(offset)`. Bench-only
      * leg — a 2M × 1.5 KB topic costs no broker memory. */
    def addSyntheticPartition(topic: String, partition: Int, records: Long,
                              batchSize: Int, gen: Long => (String, String),
                              leader: Int = 0): PartitionLog = {
      val log = addPartition(topic, partition, leader)
      log.synthetic = Some((records, batchSize, gen))
      log
    }

    /** Append key/value pairs as one record batch at the log end. */
    def append(topic: String, partition: Int, kvs: Seq[(String, String)],
               timestampMs: Long = 1700000000000L, attributes: Int = 0): Unit = {
      val log = addPartition(topic, partition) // keeps existing leader if present
      log.synchronized {
        val base = log.logEnd
        val recs = kvs.zipWithIndex.map { case ((k, v), i) =>
          Records.Record(base + i, timestampMs + i,
            if (k == null) null else k.getBytes(StandardCharsets.UTF_8),
            if (v == null) null else v.getBytes(StandardCharsets.UTF_8))
        }
        log.batches += LogBatch(base, base + kvs.size - 1,
          Records.encodeBatch(base, recs, attributes))
      }
    }

    /** Append key/value pairs as one TRANSACTIONAL batch under `producerId`
      * — the transaction stays OPEN (holding the LSO at its first offset)
      * until [[endTxn]] writes its control marker. */
    def appendTransactional(topic: String, partition: Int, producerId: Long,
                            kvs: Seq[(String, String)],
                            timestampMs: Long = 1700000000000L): Unit = {
      val log = addPartition(topic, partition)
      log.synchronized {
        val base = log.logEnd
        val recs = kvs.zipWithIndex.map { case ((k, v), i) =>
          Records.Record(base + i, timestampMs + i,
            if (k == null) null else k.getBytes(StandardCharsets.UTF_8),
            if (v == null) null else v.getBytes(StandardCharsets.UTF_8))
        }
        log.batches += LogBatch(base, base + kvs.size - 1,
          Records.encodeBatch(base, recs, attributes = 0x10 /* transactional */,
            producerId = producerId))
        if (!log.openTxns.contains(producerId)) log.openTxns(producerId) = base
      }
    }

    /** End `producerId`'s open transaction with a COMMIT or ABORT control
      * marker at the log end; an abort is recorded for read_committed
      * fetch responses. */
    def endTxn(topic: String, partition: Int, producerId: Long, commit: Boolean): Unit = {
      val log = topics.get(topic)(partition)
      log.synchronized {
        val at = log.logEnd
        log.batches += LogBatch(at, at, Records.encodeControl(at, producerId, commit))
        log.openTxns.remove(producerId).foreach { first =>
          if (!commit) log.abortedTxns += ((producerId, first))
        }
      }
    }

    /** Simulate retention: drop batches whose last offset precedes `to`
      * and raise the log start — fetches below it then answer error 1. */
    def truncateTo(topic: String, partition: Int, to: Long): Unit = {
      val log = topics.get(topic)(partition)
      log.synchronized {
        val keep = log.batches.filter(_.lastOffset >= to)
        log.batches.clear()
        log.batches ++= keep
        log.logStart = to
      }
    }

    /** Simulate an unclean leader election: drop batches whose FIRST offset
      * is at/after `to`, shrinking the log END — fetches above it then
      * answer error 1, the same answer a real broker gives for a
      * checkpoint that outran the surviving log. */
    def truncateEndTo(topic: String, partition: Int, to: Long): Unit = {
      val log = topics.get(topic)(partition)
      log.synchronized {
        val keep = log.batches.filter(_.baseOffset < to)
        log.batches.clear()
        log.batches ++= keep
      }
    }

    /** Append a pre-built batch (for control / compacted-shape fixtures). */
    def appendRaw(topic: String, partition: Int, baseOffset: Long, lastOffset: Long,
                  bytes: Array[Byte]): Unit = {
      val log = topics.get(topic)(partition)
      log.synchronized { log.batches += LogBatch(baseOffset, lastOffset, bytes) }
    }

    def stop(): Unit = brokerList.foreach(_.stop())
  }
}

final class MiniKafkaBroker private[kafka] (cluster: MiniKafkaBroker.Cluster, val nodeId: Int,
                                            tls: Option[javax.net.ssl.SSLContext] = None) {
  import MiniKafkaBroker._

  private val server: ServerSocket = tls match {
    case None => new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    case Some(ctx) => ctx.getServerSocketFactory
      .createServerSocket(0, 16, InetAddress.getLoopbackAddress)
  }
  @volatile private var running = true
  val host: String = "127.0.0.1"
  val port: Int = server.getLocalPort
  def address: String = s"$host:$port"

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s), s"mini-kafka-$nodeId-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () }
    }
  }, s"mini-kafka-$nodeId-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => () }
  }

  // ---- per-connection protocol loop -------------------------------------

  private final class ConnState {
    var authenticated: Boolean = cluster.sasl.isEmpty
    var mechanism: String = null // negotiated in SaslHandshake
    var scramServerFirst: String = null
    var scramClientFirstBare: String = null
    var scramAlg: String = null
    var scramSalt: Array[Byte] = null
  }

  private def serve(sock: Socket): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    val st = new ConnState
    try {
      var open = true
      while (open && running) {
        Wire.tryReadFrame(in) match {
          case None => open = false
          case Some(frame) =>
            val r = new Wire.Reader(frame)
            val apiKey = r.int16()
            val apiVersion = r.int16()
            val correlationId = r.int32()
            r.string() // clientId
            val w = new Wire.Writer
            w.int32(correlationId)
            apiKey match {
              case Wire.ApiVersions => apiVersionsResp(w)
              case Wire.ApiSaslHandshake => saslHandshake(r, w, st)
              case Wire.ApiSaslAuthenticate => saslAuthenticate(r, w, st)
              case _ if !st.authenticated =>
                // A SASL listener kills connections that skip the handshake.
                open = false
              case Wire.ApiMetadata => metadataResp(r, w)
              case Wire.ApiListOffsets => listOffsetsResp(r, w, apiVersion)
              case Wire.ApiFetch => fetchResp(r, w, apiVersion)
              case Wire.ApiProduce => produceResp(r, w)
              case Wire.ApiFindCoordinator => findCoordinatorResp(r, w, apiVersion)
              case Wire.ApiOffsetCommit => offsetCommitResp(r, w)
              case Wire.ApiOffsetFetch => offsetFetchResp(r, w)
              case Wire.ApiInitProducerId => initProducerIdResp(r, w)
              case Wire.ApiAddPartitionsToTxn => addPartitionsToTxnResp(r, w)
              case Wire.ApiEndTxn => endTxnResp(r, w)
              case other =>
                throw new IllegalStateException(s"mini broker: unsupported api $other")
            }
            if (open) Wire.writeFrame(out, w.toArray)
        }
      }
    } catch { case _: Throwable => () }
    finally { try sock.close() catch { case _: Throwable => () } }
  }

  private def apiVersionsResp(w: Wire.Writer): Unit = {
    w.int16(0)
    val apis = Seq(Wire.ApiProduce -> (0, 3), Wire.ApiFetch -> (0, 4),
      Wire.ApiListOffsets -> (0, 2),
      Wire.ApiMetadata -> (0, 1), Wire.ApiSaslHandshake -> (0, 1),
      Wire.ApiVersions -> (0, 0), Wire.ApiSaslAuthenticate -> (0, 0),
      Wire.ApiOffsetCommit -> (0, 2), Wire.ApiOffsetFetch -> (0, 1),
      Wire.ApiFindCoordinator -> (0, 1), Wire.ApiInitProducerId -> (0, 0),
      Wire.ApiAddPartitionsToTxn -> (0, 0), Wire.ApiEndTxn -> (0, 0))
    w.int32(apis.size)
    apis.foreach { case (k, (mn, mx)) => w.int16(k).int16(mn).int16(mx) }
    ()
  }

  private val Mechanisms = Seq("PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512")

  private def saslHandshake(r: Wire.Reader, w: Wire.Writer, st: ConnState): Unit = {
    val mech = r.string()
    val ok = Mechanisms.contains(mech)
    if (ok) st.mechanism = mech
    w.int16(if (ok) 0 else 33) // 33 = UNSUPPORTED_SASL_MECHANISM
    w.int32(Mechanisms.size)
    Mechanisms.foreach(w.string)
    ()
  }

  private def authFail(w: Wire.Writer, msg: String): Unit = {
    w.int16(58) // SASL_AUTHENTICATION_FAILED
    w.string(msg)
    w.bytes(Array.emptyByteArray)
    ()
  }

  private def saslAuthenticate(r: Wire.Reader, w: Wire.Writer, st: ConnState): Unit = {
    val payload = r.bytes()
    val expected = cluster.sasl.getOrElse(SaslUser("", ""))
    val text = new String(payload, StandardCharsets.UTF_8)
    if (text.startsWith("n,,")) {
      // SCRAM client-first. The hash is fixed by the mechanism negotiated
      // in SaslHandshake: SaltedPassword/StoredKey are hash-specific, so a
      // SCRAM-SHA-512 exchange verified with SHA-256 math can never pass.
      st.scramClientFirstBare = text.substring(3)
      val attrs = Scram.parseAttrs(st.scramClientFirstBare)
      val user = Scram.unescapeSaslName(attrs("n"))
      if (user != expected.username) { authFail(w, s"unknown user $user"); return }
      st.scramAlg = if (st.mechanism == "SCRAM-SHA-512") "SHA-512" else "SHA-256"
      st.scramSalt = "mini-broker-salt".getBytes(StandardCharsets.UTF_8)
      val snonce = "srvNONCE01"
      st.scramServerFirst =
        s"r=${attrs("r")}$snonce,s=${java.util.Base64.getEncoder.encodeToString(st.scramSalt)},i=4096"
      w.int16(0); w.string(null)
      w.bytes(st.scramServerFirst.getBytes(StandardCharsets.UTF_8))
      ()
    } else if (st.scramServerFirst != null) {
      // SCRAM client-final
      val attrs = Scram.parseAttrs(text)
      val noProof = text.substring(0, text.lastIndexOf(",p="))
      val authMessage = s"${st.scramClientFirstBare},${st.scramServerFirst},$noProof"
      val sp = Scram.saltedPassword(st.scramAlg, expected.password, st.scramSalt, 4096)
      val storedK = Scram.storedKey(st.scramAlg, Scram.clientKey(st.scramAlg, sp))
      val proof = java.util.Base64.getDecoder.decode(attrs("p"))
      if (!Scram.verifyClientProof(st.scramAlg, storedK, authMessage, proof)) {
        st.scramServerFirst = null
        authFail(w, "SCRAM proof mismatch")
      } else {
        st.authenticated = true
        st.scramServerFirst = null
        val sig = Scram.serverSignature(st.scramAlg, sp, authMessage)
        if (cluster.tamperScramServerSignature) sig(0) = (sig(0) ^ 0x01).toByte
        w.int16(0); w.string(null)
        w.bytes(("v=" + java.util.Base64.getEncoder.encodeToString(sig))
          .getBytes(StandardCharsets.UTF_8))
        ()
      }
    } else {
      // PLAIN: authzid NUL authcid NUL passwd
      val parts = text.split('\u0000')
      if (parts.length == 3 && parts(1) == expected.username && parts(2) == expected.password) {
        st.authenticated = true
        w.int16(0); w.string(null); w.bytes(Array.emptyByteArray)
        ()
      } else authFail(w, "PLAIN credentials rejected")
    }
  }

  private def metadataResp(r: Wire.Reader, w: Wire.Writer): Unit = {
    val reqCount = r.int32()
    val wanted = (0 until math.max(reqCount, 0)).map(_ => r.string())
    wanted.foreach(cluster.metadataRequests.add)
    val bs = cluster.brokerList
    w.int32(bs.size)
    bs.foreach { b => w.int32(b.nodeId).string(b.host).int32(b.port).string(null) }
    w.int32(0) // controller id
    // Real Metadata v1+ semantics: ONLY a null array (-1) lists all topics;
    // an empty array (0) returns none. Mirroring the real broker here keeps
    // the fixture from masking client-side encoding bugs.
    val names =
      if (reqCount < 0) { import scala.jdk.CollectionConverters._; cluster.topics.keySet.asScala.toSeq }
      else wanted
    w.int32(names.size)
    names.foreach { name =>
      val parts = Option(cluster.topics.get(name))
      w.int16(if (parts.isDefined) 0 else 3) // 3 = UNKNOWN_TOPIC_OR_PARTITION
      w.string(name)
      w.int8(0) // is_internal
      val pm = parts.map(m => m.synchronized(m.toSeq.sortBy(_._1))).getOrElse(Nil)
      w.int32(pm.size)
      pm.foreach { case (pid, log) =>
        w.int16(0).int32(pid).int32(log.leader)
        w.int32(1).int32(log.leader) // replicas
        w.int32(1).int32(log.leader) // isr
      }
    }
    ()
  }

  private def listOffsetsResp(r: Wire.Reader, w: Wire.Writer, version: Int): Unit = {
    r.int32() // replica_id
    // v2 carries the isolation level: under read_committed (1) a "latest"
    // (-1) query answers the LAST STABLE OFFSET, not the log end.
    val isolation = if (version >= 2) r.int8() else 0: Byte
    val topicCount = r.int32()
    val req = (0 until topicCount).map { _ =>
      val name = r.string()
      val parts = (0 until r.int32()).map(_ => (r.int32(), r.int64()))
      name -> parts
    }
    if (version >= 2) w.int32(0) // throttle_time_ms
    w.int32(req.size)
    req.foreach { case (name, parts) =>
      w.string(name)
      w.int32(parts.size)
      parts.foreach { case (pid, ts) =>
        val log = Option(cluster.topics.get(name)).flatMap(m => m.synchronized(m.get(pid)))
        log match {
          case None => w.int32(pid).int16(3).int64(-1L).int64(-1L)
          case Some(l) =>
            val off =
              if (ts == -2L) l.logStart
              else if (ts == -1L) { if (isolation == 1) l.lastStable else l.logEnd }
              else l.synchronized {
                // real timestamp query: FIRST offset whose record timestamp
                // is >= ts; -1 when the time is past the newest record
                l.batches.iterator.flatMap(b => Records.decodeAll(b.bytes).records)
                  .find(_.timestampMs >= ts).map(_.offset).getOrElse(-1L)
              }
            w.int32(pid).int16(0).int64(-1L).int64(off)
        }
        ()
      }
    }
    ()
  }

  /** Produce v3: decode the client batch, append at the log end with
    * re-based offsets (headers/timestamps preserved), answer the assigned
    * base offset. A non-leader refuses with error 6; an unknown partition
    * with error 3 — the same contract the Fetch side enforces. */
  private def produceResp(r: Wire.Reader, w: Wire.Writer): Unit = {
    val reqTxnId = r.string()
    r.int16()  // acks
    r.int32()  // timeout_ms
    val topicCount = r.int32()
    val req = (0 until topicCount).map { _ =>
      val name = r.string()
      val parts = (0 until r.int32()).map { _ =>
        val pid = r.int32()
        val recordSet = r.bytes()
        (pid, recordSet)
      }
      name -> parts
    }
    w.int32(req.size)
    req.foreach { case (name, parts) =>
      w.string(name)
      w.int32(parts.size)
      parts.foreach { case (pid, recordSet) =>
        val logOpt = Option(cluster.topics.get(name)).flatMap(m => m.synchronized(m.get(pid)))
        logOpt match {
          case None =>
            w.int32(pid).int16(3).int64(-1L).int64(-1L)
          case Some(log) if log.leader != nodeId =>
            w.int32(pid).int16(6).int64(-1L).int64(-1L)
          case Some(log) =>
            // attributes int16 sits at bytes 21-22 of a v2 batch (after
            // baseOffset+length+epoch+magic+crc); bits 0-2 name the codec,
            // bit 4 marks a transactional batch
            val attrs =
              if (recordSet != null && recordSet.length > 22)
                (recordSet(21) & 0xff) << 8 | (recordSet(22) & 0xff)
              else 0
            if (recordSet != null && recordSet.length > 22)
              cluster.producedCodecs.add(attrs & 0x07)
            val transactional = (attrs & Records.TransactionalBit) != 0
            // idempotence header fields: producerId at byte 43,
            // baseSequence at 53 (fixed v2 header layout)
            val hdr = new Wire.Reader(recordSet, 43)
            val producerId = hdr.int64()
            val batchEpoch = hdr.int16()
            val baseSeq = hdr.int32()
            // real brokers REJECT transactional batches on a request with
            // no transactional_id (53), and FENCE stale producer epochs
            // (47) — the two contracts a client bug would otherwise ship
            // past single-broker tests
            val txnErr =
              if (transactional && reqTxnId == null) 53
              else if (transactional &&
                batchEpoch < cluster.producerEpochs.getOrDefault(producerId, 0)) 47
              else 0
            if (txnErr != 0) { w.int32(pid).int16(txnErr).int64(-1L).int64(-1L); () }
            else {
            val dec = Records.decodeAll(recordSet)
            log.synchronized {
              val state = if (producerId >= 0 && baseSeq >= 0)
                log.producerSeqs.get(producerId) else None
              val expected = state.map(_._1).getOrElse(0)
              if (producerId >= 0 && baseSeq >= 0 && state.exists(_._2 == baseSeq)) {
                // exact retry of the last accepted batch: answer the SAME
                // base offset, append nothing — the dedup idempotence buys
                w.int32(pid).int16(0).int64(state.get._3).int64(-1L)
              } else if (producerId >= 0 && baseSeq >= 0 && baseSeq != expected) {
                // 45 OUT_OF_ORDER_SEQUENCE_NUMBER: a gap (lost batch) or a
                // stale re-send older than the last accepted one
                w.int32(pid).int16(45).int64(-1L).int64(-1L)
              } else {
                val b = log.logEnd
                val rebased = dec.records.zipWithIndex.map { case (rec, i) =>
                  rec.copy(offset = b + i)
                }
                // preserve the transactional flag + producer id in the
                // stored batch — read_committed filtering depends on them
                log.batches += LogBatch(b, b + rebased.size - 1,
                  Records.encodeBatch(b, rebased,
                    attributes = if (transactional) Records.TransactionalBit else 0,
                    producerId = if (transactional) producerId else -1L))
                if (transactional && !log.openTxns.contains(producerId))
                  log.openTxns(producerId) = b
                if (producerId >= 0 && baseSeq >= 0)
                  log.producerSeqs(producerId) = (baseSeq + dec.records.size, baseSeq, b)
                w.int32(pid).int16(0).int64(b).int64(-1L)
              }
            }
            }
        }
        ()
      }
    }
    w.int32(0) // throttle_time_ms — tail position in Produce v1-v5
    ()
  }

  private def isTxnCoordinator: Boolean = cluster.brokerList.head.nodeId == nodeId

  /** InitProducerId v0. A known transactional.id keeps its producerId and
    * BUMPS the epoch (what fences a zombie attempt); non-coordinators
    * refuse transactional inits with error 16. */
  private def initProducerIdResp(r: Wire.Reader, w: Wire.Writer): Unit = {
    val txnId = r.string()
    cluster.lastTxnTimeoutMs = r.int32()
    if (txnId != null && !isTxnCoordinator) {
      w.int32(0).int16(16).int64(-1L).int16(-1) // NOT_COORDINATOR
      return
    }
    val (pid, epoch) =
      if (txnId == null) (cluster.nextProducerId.getAndIncrement(), 0)
      else cluster.txnIds.compute(txnId, (_, prev) =>
        if (prev == null) (cluster.nextProducerId.getAndIncrement(), 0)
        else (prev._1, prev._2 + 1))
    cluster.producerEpochs.put(pid, epoch)
    w.int32(0).int16(0).int64(pid).int16(epoch)
    ()
  }

  private def addPartitionsToTxnResp(r: Wire.Reader, w: Wire.Writer): Unit = {
    r.string() // transactional_id
    val producerId = r.int64()
    val epoch = r.int16()
    val stale = epoch < cluster.producerEpochs.getOrDefault(producerId, 0)
    val topicCount = r.int32()
    val req = (0 until topicCount).map { _ =>
      val name = r.string()
      val parts = (0 until r.int32()).map(_ => r.int32())
      name -> parts
    }
    val set = cluster.txnPartitions.computeIfAbsent(producerId,
      _ => mutable.Set.empty[(String, Int)])
    w.int32(0) // throttle_time_ms
    w.int32(req.size)
    req.foreach { case (name, parts) =>
      w.string(name)
      w.int32(parts.size)
      parts.foreach { pid =>
        if (!isTxnCoordinator) w.int32(pid).int16(16)      // NOT_COORDINATOR
        else if (stale) w.int32(pid).int16(47)             // INVALID_PRODUCER_EPOCH
        else {
          set.synchronized { set += ((name, pid)) }
          w.int32(pid).int16(0)
        }
        ()
      }
    }
    ()
  }

  /** EndTxn v0: write a COMMIT/ABORT control marker to every partition the
    * transaction declared — the same marker path the fixture's endTxn uses,
    * so LSO/aborted-txn bookkeeping is shared. */
  private def endTxnResp(r: Wire.Reader, w: Wire.Writer): Unit = {
    r.string() // transactional_id
    val producerId = r.int64()
    val epoch = r.int16()
    val commit = r.int8() == 1
    w.int32(0) // throttle_time_ms
    if (!isTxnCoordinator) { w.int16(16); return }
    if (epoch < cluster.producerEpochs.getOrDefault(producerId, 0)) {
      w.int16(47); return // fenced zombie must not (ab)use EndTxn
    }
    val touched = Option(cluster.txnPartitions.remove(producerId))
      .map(s => s.synchronized(s.toSeq.sorted)).getOrElse(Nil)
    touched.foreach { case (topic, pid) => cluster.endTxn(topic, pid, producerId, commit) }
    w.int16(0)
    ()
  }

  /** FindCoordinator v0 (groups) / v1 (+key_type: 1 = transactions): the
    * first cluster broker coordinates everything — a fixed assignment is
    * all the client contract needs (it must ASK, then go THERE). */
  private def findCoordinatorResp(r: Wire.Reader, w: Wire.Writer, version: Int): Unit = {
    r.string() // key (group id / transactional id)
    if (version >= 1) r.int8() // key_type
    val coord = cluster.brokerList.head
    if (version >= 1) {
      w.int32(0) // throttle_time_ms
      w.int16(0).string(null) // error, error_message
      w.int32(coord.nodeId).string(coord.host).int32(coord.port)
    } else {
      w.int16(0).int32(coord.nodeId).string(coord.host).int32(coord.port)
    }
    ()
  }

  /** OffsetCommit v2: store per-partition committed offsets under the
    * group. A non-coordinator answers error 16 NOT_COORDINATOR — the
    * mistake FindCoordinator exists to prevent. */
  private def offsetCommitResp(r: Wire.Reader, w: Wire.Writer): Unit = {
    val group = r.string()
    r.int32()  // generation_id
    r.string() // member_id
    r.int64()  // retention_time
    val isCoordinator = cluster.brokerList.head.nodeId == nodeId
    val topicCount = r.int32()
    val req = (0 until topicCount).map { _ =>
      val name = r.string()
      val parts = (0 until r.int32()).map { _ =>
        val pid = r.int32(); val off = r.int64(); r.string() // metadata
        (pid, off)
      }
      name -> parts
    }
    w.int32(req.size)
    req.foreach { case (name, parts) =>
      w.string(name)
      w.int32(parts.size)
      parts.foreach { case (pid, off) =>
        if (!isCoordinator) w.int32(pid).int16(16) // NOT_COORDINATOR
        else {
          cluster.groupOffsets.put((group, name, pid), off)
          w.int32(pid).int16(0)
        }
        ()
      }
    }
    ()
  }

  /** OffsetFetch v1: committed offset per requested partition, -1 when the
    * group never committed one. */
  private def offsetFetchResp(r: Wire.Reader, w: Wire.Writer): Unit = {
    val group = r.string()
    val topicCount = r.int32()
    val req = (0 until topicCount).map { _ =>
      val name = r.string()
      val parts = (0 until r.int32()).map(_ => r.int32())
      name -> parts
    }
    w.int32(req.size)
    req.foreach { case (name, parts) =>
      w.string(name)
      w.int32(parts.size)
      parts.foreach { pid =>
        val off = cluster.groupOffsets.getOrDefault((group, name, pid), -1L)
        w.int32(pid).int64(off).string(null).int16(0)
        ()
      }
    }
    ()
  }

  private def fetchResp(r: Wire.Reader, w: Wire.Writer, version: Int): Unit = {
    r.int32() // replica_id
    r.int32() // max_wait
    r.int32() // min_bytes
    val respMaxBytes = if (version >= 3) r.int32() else Int.MaxValue
    val isolation = if (version >= 4) r.int8() else 0: Byte
    val topicCount = r.int32()
    val req = (0 until topicCount).map { _ =>
      val name = r.string()
      val parts = (0 until r.int32()).map { _ =>
        val pid = r.int32(); val off = r.int64(); val pmax = r.int32()
        (pid, off, pmax)
      }
      name -> parts
    }
    w.int32(0) // throttle
    w.int32(req.size)
    req.foreach { case (name, parts) =>
      w.string(name)
      w.int32(parts.size)
      parts.foreach { case (pid, off, pmax) =>
        val logOpt = Option(cluster.topics.get(name)).flatMap(m => m.synchronized(m.get(pid)))
        logOpt match {
          case None =>
            w.int32(pid).int16(3).int64(-1L).int64(-1L).int32(0).bytes(null)
          case Some(log) if log.leader != nodeId =>
            // The defining multi-broker behavior: a non-leader refuses.
            w.int32(pid).int16(6).int64(-1L).int64(-1L).int32(0).bytes(null)
          case Some(log) if off < log.logStart || off > log.logEnd =>
            // error 1 OFFSET_OUT_OF_RANGE: retention truncated the start
            // below the offset, or an unclean election truncated the END
            // below it — both answered the same way by a real broker.
            w.int32(pid).int16(1).int64(-1L).int64(-1L).int32(0).bytes(null)
          case Some(log) if log.synthetic.isDefined =>
            // synthetic leg: encode batchSize-aligned batches from the
            // generator until the byte budget is spent (at least one, the
            // protocol's progress guarantee); the client's own
            // records-below-fetch-offset filter handles the alignment skip
            val (count, bs, gen) = log.synthetic.get
            val cap = math.min(pmax.toLong, respMaxBytes.toLong).toInt
            val buf = new Wire.Writer
            var base = off - (off % bs)
            var first = true
            while (base < count && (first || buf.size < cap)) {
              val hi = math.min(base + bs, count)
              val recs = (base until hi).map { o =>
                val (k, v) = gen(o)
                Records.Record(o, 1700000000000L + o,
                  if (k == null) null else k.getBytes(StandardCharsets.UTF_8),
                  if (v == null) null else v.getBytes(StandardCharsets.UTF_8))
              }
              buf.bytesRaw(Records.encodeBatch(base, recs))
              base = hi
              first = false
            }
            w.int32(pid).int16(0).int64(count).int64(count)
            w.int32(0)
            w.bytes(if (buf.size == 0) null else buf.toArray)
          case Some(log) =>
            val (hwm, lso, aborted, payload) = log.synchronized {
              val cap = math.min(pmax.toLong, respMaxBytes.toLong).toInt
              val stable = log.lastStable
              // read_committed never serves rows at/above the LSO — they sit
              // behind a still-open transaction.
              val hits = log.batches.filter(b => b.lastOffset >= off &&
                (isolation != 1 || b.baseOffset < stable))
              val buf = new Wire.Writer
              var budget = cap
              var first = true
              hits.takeWhile { b =>
                val fits = first || b.bytes.length <= budget
                if (fits) { buf.bytesRaw(b.bytes); budget -= b.bytes.length; first = false }
                fits
              }.size
              // Over-reporting aborted txns is safe (the client's filter only
              // acts when it actually sees that producer's data batches), so
              // the fake skips the txn-index overlap math and names them all.
              val ab = if (isolation == 1) log.abortedTxns.toSeq else Nil
              (log.logEnd, stable, ab, buf.toArray)
            }
            w.int32(pid).int16(0).int64(hwm).int64(lso)
            w.int32(aborted.size)
            aborted.foreach { case (producerId, firstOffset) =>
              w.int64(producerId).int64(firstOffset)
            }
            w.bytes(if (payload.isEmpty) null else payload)
        }
        ()
      }
    }
    ()
  }
}
