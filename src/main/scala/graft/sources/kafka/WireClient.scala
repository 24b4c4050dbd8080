package graft.sources.kafka

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/** Minimal blocking Kafka client over [[Wire]] — exactly what a consumer
  * needs: ApiVersions (handshake sanity), Metadata v1 (brokers + partition
  * leaders), ListOffsets v1 (earliest/latest), Fetch v4 (record batch v2
  * payloads), and SASL (Handshake v1 + Authenticate v0; PLAIN and
  * SCRAM-SHA-256/512 per RFC 5802/7677). One socket per client;
  * [[KafkaWireSource]] opens one per Spark task, the same connection shape
  * as the real consumer's per-partition fetch streams (reference:
  * glassflow-api/internal/kafka/consumer.go fetch + SASL config,
  * internal/constants.go:250-259 min 100 KB / max 1 MB / max wait 750 ms —
  * the same defaults used here).
  */
final class WireClient(host: String, port: Int, clientId: String = "graft",
                       sasl: Option[WireClient.SaslConfig] = None,
                       tls: Option[WireClient.TlsConfig] = None) extends AutoCloseable {
  import WireClient._

  private val socket: Socket = {
    val plain = new Socket()
    plain.connect(new InetSocketAddress(host, port), 10000)
    plain.setSoTimeout(30000)
    plain.setTcpNoDelay(true)
    tls match {
      case None => plain
      case Some(cfg) =>
        // TLS over the connected socket (server-name set for SNI +
        // hostname verification); handshake up front so a certificate
        // the client does not trust fails HERE, not mid-fetch.
        val s = cfg.sslContext.getSocketFactory
          .createSocket(plain, host, port, true).asInstanceOf[javax.net.ssl.SSLSocket]
        val params = s.getSSLParameters
        if (!cfg.skipVerify) params.setEndpointIdentificationAlgorithm("HTTPS")
        s.setSSLParameters(params)
        s.startHandshake()
        s
    }
  }
  private val in = new java.io.BufferedInputStream(socket.getInputStream)
  private val out = new java.io.BufferedOutputStream(socket.getOutputStream)
  private var correlation = 0

  sasl.foreach(authenticate)

  private def roundTrip(apiKey: Int, apiVersion: Int)(body: Wire.Writer => Unit): Wire.Reader =
    synchronized {
      correlation += 1
      val id = correlation
      val w = new Wire.Writer
      Wire.requestHeader(w, apiKey, apiVersion, id, clientId)
      body(w)
      Wire.writeFrame(out, w.toArray)
      val r = new Wire.Reader(Wire.readFrame(in))
      val gotId = r.int32()
      if (gotId != id)
        throw new java.io.IOException(s"kafka wire: correlation mismatch (sent $id, got $gotId)")
      r
    }

  /** SaslHandshake v1 (mechanism negotiation) then the mechanism's
    * challenge/response turns over SaslAuthenticate v0 — the framed
    * post-KIP-152 flow every modern broker speaks. */
  private def authenticate(cfg: SaslConfig): Unit = {
    val hs = roundTrip(Wire.ApiSaslHandshake, 1)(w => { w.string(cfg.mechanism); () })
    val hsErr = hs.int16()
    if (hsErr != 0) {
      val offered = (0 until hs.int32()).map(_ => hs.string()).mkString(", ")
      throw new java.io.IOException(
        s"SASL handshake rejected (error $hsErr); broker offers: $offered")
    }
    def turn(payload: Array[Byte]): Array[Byte] = {
      val r = roundTrip(Wire.ApiSaslAuthenticate, 0)(w => { w.bytes(payload); () })
      val err = r.int16()
      val msg = r.string()
      val back = r.bytes()
      if (err != 0)
        throw new java.io.IOException(s"SASL authentication failed (error $err): $msg")
      back
    }
    cfg.mechanism match {
      case "PLAIN" =>
        // RFC 4616: [authzid] NUL authcid NUL passwd
        val tok = ("\u0000" + cfg.username + "\u0000" + cfg.password)
          .getBytes(StandardCharsets.UTF_8)
        turn(tok)
        ()
      case m @ ("SCRAM-SHA-256" | "SCRAM-SHA-512") =>
        val alg = if (m.endsWith("512")) "SHA-512" else "SHA-256"
        val cnonce = Scram.freshNonce()
        val clientFirstBare = s"n=${Scram.saslName(cfg.username)},r=$cnonce"
        val serverFirst = new String(
          turn(("n,," + clientFirstBare).getBytes(StandardCharsets.UTF_8)),
          StandardCharsets.UTF_8)
        val attrs = Scram.parseAttrs(serverFirst)
        val nonce = attrs("r")
        if (!nonce.startsWith(cnonce))
          throw new java.io.IOException("SCRAM: server nonce does not extend client nonce")
        val salt = java.util.Base64.getDecoder.decode(attrs("s"))
        val iters = attrs("i").toInt
        val clientFinalNoProof = s"c=biws,r=$nonce"
        val authMessage = s"$clientFirstBare,$serverFirst,$clientFinalNoProof"
        val sp = Scram.saltedPassword(alg, cfg.password, salt, iters)
        val proof = Scram.clientProof(alg, sp, authMessage)
        val expectedServerSig = Scram.serverSignature(alg, sp, authMessage)
        val serverFinal = new String(
          turn((clientFinalNoProof + ",p=" +
            java.util.Base64.getEncoder.encodeToString(proof))
            .getBytes(StandardCharsets.UTF_8)),
          StandardCharsets.UTF_8)
        val v = Scram.parseAttrs(serverFinal).getOrElse("v",
          throw new java.io.IOException(s"SCRAM: server-final carries no verifier: $serverFinal"))
        if (!java.util.Arrays.equals(java.util.Base64.getDecoder.decode(v), expectedServerSig))
          throw new java.io.IOException(
            "SCRAM: server signature mismatch — peer does not know the password (MITM?)")
      case other =>
        throw new IllegalArgumentException(s"unsupported SASL mechanism '$other' " +
          "(supported: PLAIN, SCRAM-SHA-256, SCRAM-SHA-512)")
    }
  }

  /** Produce v3 (the record-batch-v2 era, pre-flexible): one batch to one
    * partition; returns the broker-assigned base offset. acks=-1 waits for
    * full ISR acknowledgement (the durable default). The record offsets in
    * `records` are relative (0..n-1) — the broker assigns the real ones. */
  /** InitProducerId v0: a broker-assigned (producerId, epoch) pair — the
    * identity that makes produce retries idempotent (the broker dedups on
    * (producerId, epoch, baseSequence) per partition). With a
    * `transactionalId` the identity also anchors transactions: batches
    * marked transactional stay invisible to read_committed consumers until
    * [[endTxn]] commits. */
  def initProducerId(timeoutMs: Int = 30000,
                     transactionalId: String = null): (Long, Int) = {
    val r = roundTrip(Wire.ApiInitProducerId, 0) { w =>
      w.string(transactionalId)
      w.int32(timeoutMs)
      ()
    }
    r.int32() // throttle_time_ms
    val err = r.int16()
    if (err != 0) throw new java.io.IOException(s"InitProducerId error $err")
    (r.int64(), r.int16())
  }

  /** AddPartitionsToTxn v0: declare a partition as touched by the open
    * transaction BEFORE producing to it — the broker must know where to
    * write the commit/abort markers at EndTxn. */
  def addPartitionsToTxn(transactionalId: String, producerId: Long, epoch: Int,
                         topic: String, partitions: Seq[Int]): Unit = {
    val r = roundTrip(Wire.ApiAddPartitionsToTxn, 0) { w =>
      w.string(transactionalId)
      w.int64(producerId)
      w.int16(epoch)
      w.int32(1); w.string(topic)
      w.int32(partitions.size)
      partitions.foreach(w.int32)
      ()
    }
    r.int32() // throttle_time_ms
    (0 until r.int32()).foreach { _ =>
      r.string()
      (0 until r.int32()).foreach { _ =>
        val pid = r.int32()
        val err = r.int16()
        if (err != 0) throw new java.io.IOException(
          s"AddPartitionsToTxn error $err on $topic-$pid")
      }
    }
  }

  /** EndTxn v0: commit (true) or abort (false) the open transaction — the
    * broker writes a control marker to every partition the transaction
    * declared, which is the moment read_committed consumers (dis)cover the
    * rows. */
  def endTxn(transactionalId: String, producerId: Long, epoch: Int,
             commit: Boolean): Unit = {
    val r = roundTrip(Wire.ApiEndTxn, 0) { w =>
      w.string(transactionalId)
      w.int64(producerId)
      w.int16(epoch)
      w.int8(if (commit) 1 else 0)
      ()
    }
    r.int32() // throttle_time_ms
    val err = r.int16()
    if (err != 0) throw new java.io.IOException(s"EndTxn error $err")
  }

  def produce(topic: String, partition: Int, records: Seq[Records.Record],
              acks: Int = -1, timeoutMs: Int = 30000, codec: Int = 0,
              producerId: Long = -1L, baseSequence: Int = -1,
              transactionalId: String = null, producerEpoch: Int = Int.MinValue): Long = {
    val transactional = transactionalId != null
    val batch = Records.encodeBatch(0L,
      records.zipWithIndex.map { case (rec, i) => rec.copy(offset = i.toLong) },
      attributes = codec | (if (transactional) Records.TransactionalBit else 0),
      producerId = producerId, baseSequence = baseSequence,
      producerEpoch = producerEpoch)
    val r = roundTrip(Wire.ApiProduce, 3) { w =>
      // brokers REQUIRE a non-null transactional_id on any request carrying
      // transactional batches — the attribute bit alone is rejected
      w.string(transactionalId)
      w.int16(acks)
      w.int32(timeoutMs)
      w.int32(1); w.string(topic)
      w.int32(1)
      w.int32(partition)
      w.bytes(batch)
      ()
    }
    var base = -1L
    (0 until r.int32()).foreach { _ =>
      r.string()
      (0 until r.int32()).foreach { _ =>
        val pid = r.int32()
        val err = r.int16()
        val off = r.int64()
        r.int64() // log_append_time
        if (err == 6)
          throw new WireClient.NotLeader(
            s"this broker is not the leader for $topic-$pid (leadership moved?)")
        if (err == 45)
          throw new java.io.IOException(
            s"Produce error 45 OUT_OF_ORDER_SEQUENCE_NUMBER on $topic-$pid: " +
              "the batch sequence does not follow the broker's last accepted one " +
              "(a lost batch in between, or a second producer instance reusing this id)")
        if (err == 47)
          throw new java.io.IOException(
            s"Produce error 47 INVALID_PRODUCER_EPOCH on $topic-$pid: " +
              "this producer was FENCED — a newer instance claimed the same " +
              "transactional id (zombie task attempt?)")
        if (err == 53)
          throw new java.io.IOException(
            s"Produce error 53 TRANSACTIONAL_ID_AUTHORIZATION_FAILED on $topic-$pid: " +
              "transactional batches require a transactional_id on the request")
        if (err != 0)
          throw new java.io.IOException(s"Produce error $err on $topic-$pid")
        if (pid == partition) base = off
      }
    }
    r.int32() // throttle_time_ms (tail position in Produce v1-v5)
    if (base < 0)
      throw new java.io.IOException(s"Produce response missing $topic-$partition")
    base
  }

  /** ApiVersions v0 → (apiKey → (min, max)). */
  def apiVersions(): Map[Int, (Int, Int)] = {
    val r = roundTrip(Wire.ApiVersions, 0)(_ => ())
    val err = r.int16()
    if (err != 0) throw new java.io.IOException(s"ApiVersions error $err")
    (0 until r.int32()).map { _ =>
      val key = r.int16(); val min = r.int16(); val max = r.int16()
      key -> (min, max)
    }.toMap
  }

  /** Metadata v1 for one topic (convenience). */
  def metadata(topic: String): ClusterMeta = metadata(Seq(topic))

  /** Metadata v1 for a topic set — brokers are kept, not skipped: partition
    * leadership routes each fetch to the RIGHT broker (fetching from a
    * non-leader fails with error 6 on any multi-broker cluster). Every
    * requested topic must be present in the response. An EMPTY `wanted`
    * asks the broker for ALL topics (the protocol's list-everything form —
    * what subscribePattern resolution needs). */
  def metadata(wanted: Seq[String]): ClusterMeta = {
    val r = roundTrip(Wire.ApiMetadata, 1) { w =>
      // Metadata v1+: a NULL topic array (-1) means "all topics"; an EMPTY
      // array (0) means "no topics". Encoding the all-topics form as int32(0)
      // gets zero topics back from a real broker, silently breaking
      // subscribePattern resolution.
      if (wanted.isEmpty) w.int32(-1)
      else { w.int32(wanted.size); wanted.foreach(w.string) }
      ()
    }
    val brokers = (0 until r.int32()).map { _ =>
      val nodeId = r.int32()
      val host = r.string()
      val port = r.int32()
      r.string() // rack
      BrokerMeta(nodeId, host, port)
    }
    r.int32() // controller id
    val topicCount = r.int32()
    val topics = (0 until topicCount).map { _ =>
      val err = r.int16()
      val name = r.string()
      r.int8() // is_internal
      val parts = (0 until r.int32()).map { _ =>
        val perr = r.int16()
        val pid = r.int32()
        val leader = r.int32()
        (0 until r.int32()).foreach(_ => r.int32()) // replicas
        (0 until r.int32()).foreach(_ => r.int32()) // isr
        PartitionMeta(pid, leader, perr)
      }
      TopicMeta(name, err, parts)
    }
    if (wanted.isEmpty) ClusterMeta(brokers, topics.sortBy(_.name))
    else {
      val missing = wanted.filterNot(t => topics.exists(_.name == t))
      if (missing.nonEmpty)
        throw new java.io.IOException(
          s"topics ${missing.mkString(", ")} absent from metadata response")
      ClusterMeta(brokers, wanted.map(t => topics.find(_.name == t).get))
    }
  }

  /** ListOffsets v2: timestamp -1 = latest (log end; LSO under
    * read_committed), -2 = earliest, >= 0 = first offset whose record
    * timestamp is at-or-after it (-1 offset when none is). */
  def listOffsets(topic: String, partitions: Seq[Int], timestamp: Long,
                  isolation: Int = 0): Map[Int, Long] = {
    if (partitions.isEmpty) return Map.empty
    // v2 (Kafka 0.11+) carries the isolation level: under read_committed
    // the "latest" (-1) answer is the LAST STABLE OFFSET, not the log end —
    // which is what keeps offset planning from promising rows that sit
    // behind an open transaction.
    val r = roundTrip(Wire.ApiListOffsets, 2) { w =>
      w.int32(-1) // replica_id
      w.int8(isolation)
      w.int32(1); w.string(topic)
      w.int32(partitions.size)
      partitions.foreach { p => w.int32(p).int64(timestamp) }
    }
    r.int32() // throttle_time_ms (v2+)
    val out = Map.newBuilder[Int, Long]
    (0 until r.int32()).foreach { _ =>
      r.string()
      (0 until r.int32()).foreach { _ =>
        val pid = r.int32()
        val err = r.int16()
        r.int64() // timestamp
        val offset = r.int64()
        if (err != 0) throw new java.io.IOException(s"ListOffsets error $err on partition $pid")
        out += pid -> offset
      }
    }
    out.result()
  }

  /** FindCoordinator v0: which broker coordinates `groupId` — OffsetCommit/
    * OffsetFetch must go THERE; any other broker answers error 16
    * (NOT_COORDINATOR). */
  def findCoordinator(groupId: String): BrokerMeta = {
    val r = roundTrip(Wire.ApiFindCoordinator, 0)(w => { w.string(groupId); () })
    val err = r.int16()
    if (err != 0) throw new java.io.IOException(s"FindCoordinator error $err for group $groupId")
    BrokerMeta(r.int32(), r.string(), r.int32())
  }

  /** FindCoordinator v1 with key_type 1: which broker coordinates
    * `transactionalId` — InitProducerId/AddPartitionsToTxn/EndTxn must go
    * THERE (any other broker answers error 16), same contract as group
    * coordination. */
  def findTxnCoordinator(transactionalId: String): BrokerMeta = {
    val r = roundTrip(Wire.ApiFindCoordinator, 1) { w =>
      w.string(transactionalId)
      w.int8(1) // key_type: transaction
      ()
    }
    r.int32() // throttle_time_ms
    val err = r.int16()
    r.string() // error_message
    if (err != 0) throw new java.io.IOException(
      s"FindCoordinator error $err for transactional id $transactionalId")
    BrokerMeta(r.int32(), r.string(), r.int32())
  }

  /** OffsetCommit v2 (Kafka-storage era): record `offsets` — each the NEXT
    * offset to consume, Kafka's committed-offset convention — under
    * `groupId`. Generation -1 / empty member = simple (non-rebalancing)
    * commit, exactly the reference consumer's shape: its processed-offset
    * commits (consumer.go:318 CommitRecords, :357 CommitUncommittedOffsets)
    * exist so external lag tooling sees progress; correctness lives in the
    * Spark checkpoint, not here. */
  def offsetCommit(groupId: String, offsets: Map[(String, Int), Long]): Unit = {
    if (offsets.isEmpty) return
    val byTopic = offsets.groupBy(_._1._1).toSeq.sortBy(_._1)
    val r = roundTrip(Wire.ApiOffsetCommit, 2) { w =>
      w.string(groupId)
      w.int32(-1)     // generation_id: not a rebalancing group member
      w.string("")    // member_id
      w.int64(-1L)    // retention_time: broker default
      w.int32(byTopic.size)
      byTopic.foreach { case (topic, ps) =>
        w.string(topic)
        w.int32(ps.size)
        ps.toSeq.sortBy(_._1._2).foreach { case ((_, p), off) =>
          w.int32(p).int64(off).string(null) // metadata
        }
      }
    }
    (0 until r.int32()).foreach { _ =>
      val topic = r.string()
      (0 until r.int32()).foreach { _ =>
        val pid = r.int32()
        val err = r.int16()
        if (err != 0)
          throw new java.io.IOException(s"OffsetCommit error $err on $topic-$pid (group $groupId)")
      }
    }
  }

  /** OffsetFetch v1 (Kafka-storage era): the group's committed offset per
    * partition, -1 when nothing is committed yet. */
  def offsetFetch(groupId: String, tps: Seq[(String, Int)]): Map[(String, Int), Long] = {
    if (tps.isEmpty) return Map.empty
    val byTopic = tps.groupBy(_._1).toSeq.sortBy(_._1)
    val r = roundTrip(Wire.ApiOffsetFetch, 1) { w =>
      w.string(groupId)
      w.int32(byTopic.size)
      byTopic.foreach { case (topic, ps) =>
        w.string(topic)
        w.int32(ps.size)
        ps.foreach(tp => w.int32(tp._2))
      }
    }
    val out = Map.newBuilder[(String, Int), Long]
    (0 until r.int32()).foreach { _ =>
      val topic = r.string()
      (0 until r.int32()).foreach { _ =>
        val pid = r.int32()
        val off = r.int64()
        r.string() // metadata
        val err = r.int16()
        if (err != 0)
          throw new java.io.IOException(s"OffsetFetch error $err on $topic-$pid (group $groupId)")
        out += (topic, pid) -> off
      }
    }
    out.result()
  }

  /** Fetch v4 from one partition at `offset`. Returns decoded records
    * (CRC-verified, control batches skipped), the partition high watermark,
    * and the offset after the last complete batch (advance cursor — may
    * exceed the last record's offset on control/compacted batches).
    * `isolation` 1 = read_committed: the broker bounds the response at the
    * last stable offset and names aborted transactions overlapping the
    * range; their batches are filtered out during decode. */
  def fetch(topic: String, partition: Int, offset: Long,
            maxBytes: Int = 1 << 20, maxWaitMs: Int = 750, minBytes: Int = 1,
            isolation: Int = 0): FetchResult = {
    val r = roundTrip(Wire.ApiFetch, 4) { w =>
      w.int32(-1)          // replica_id
      w.int32(maxWaitMs)
      w.int32(minBytes)
      w.int32(maxBytes)    // response-level cap (v3+)
      w.int8(isolation)    // 0 read_uncommitted / 1 read_committed
      w.int32(1); w.string(topic)
      w.int32(1)
      w.int32(partition).int64(offset).int32(maxBytes)
      ()
    }
    r.int32() // throttle_time_ms
    var result: FetchResult = null
    (0 until r.int32()).foreach { _ =>
      r.string()
      (0 until r.int32()).foreach { _ =>
        val pid = r.int32()
        val err = r.int16()
        val hwm = r.int64()
        val lso = r.int64() // last_stable_offset (-1 when not tracked)
        val abortedCount = r.int32()
        val aborted = (0 until math.max(abortedCount, 0)).map(_ => (r.int64(), r.int64()))
        val recordSet = r.bytes()
        if (err == 1) throw new WireClient.OffsetOutOfRange(
          s"fetch offset $offset out of range on $topic-$pid (log truncated by retention?)")
        if (err == 6) throw new WireClient.NotLeader(
          s"this broker is not the leader for $topic-$pid (leadership moved?)")
        if (err != 0) throw new java.io.IOException(s"Fetch error $err on partition $pid")
        if (pid == partition) {
          val dec =
            if (recordSet == null || recordSet.isEmpty) Records.Decoded(Nil, -1L)
            else Records.decodeAll(recordSet, aborted, readCommitted = isolation == 1)
          result = FetchResult(hwm, dec.records, dec.nextOffset,
            lastStableOffset = if (lso >= 0) lso else hwm)
        }
      }
    }
    if (result == null)
      throw new java.io.IOException(s"Fetch response missing partition $partition")
    result
  }

  override def close(): Unit = {
    try socket.close() catch { case _: Throwable => () }
  }
}

object WireClient {

  /** Kafka error 1: the requested offset precedes the log start (retention
    * truncated it) or exceeds the log end. Typed so the reader can apply
    * the failOnDataLoss policy instead of dying on a generic IO error. */
  final class OffsetOutOfRange(msg: String) extends java.io.IOException(msg)

  /** Kafka error 6: fetched/produced to a broker that no longer leads the
    * partition — the cue to refresh metadata and go to the new leader. */
  final class NotLeader(msg: String) extends java.io.IOException(msg)

  /** TLS settings mirroring the reference's surface
    * (internal/kafka/tls_conf.go MakeTLSConfigFromStrings +
    * consumer.go:200-210): base64-encoded PEM root CA, optional base64 PEM
    * client cert/key (mTLS), and skip-verify. Carried inside
    * InputPartitions, so it is Serializable and the SSLContext rebuilds
    * lazily per task. */
  final case class TlsConfig(rootCaPemB64: Option[String] = None,
                             skipVerify: Boolean = false,
                             clientCertPemB64: Option[String] = None,
                             clientKeyPemB64: Option[String] = None) extends Serializable {
    override def toString: String =
      s"TlsConfig(rootCa=${rootCaPemB64.isDefined},skipVerify=$skipVerify," +
        s"clientCert=${clientCertPemB64.isDefined},clientKey=${if (clientKeyPemB64.isDefined) "*****" else "none"})"

    @transient lazy val sslContext: javax.net.ssl.SSLContext = {
      val tms: Array[javax.net.ssl.TrustManager] =
        if (skipVerify) Array(TrustAll)
        else rootCaPemB64 match {
          case None => null // JVM default trust store
          case Some(b64) =>
            val ks = java.security.KeyStore.getInstance(java.security.KeyStore.getDefaultType)
            ks.load(null, null)
            Tls.pemCertificates(b64).zipWithIndex.foreach { case (c, i) =>
              ks.setCertificateEntry(s"ca$i", c)
            }
            val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
              javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
            tmf.init(ks)
            tmf.getTrustManagers
        }
      val kms: Array[javax.net.ssl.KeyManager] = (clientCertPemB64, clientKeyPemB64) match {
        case (Some(certB64), Some(keyB64)) =>
          val chain = Tls.pemCertificates(certB64).toArray[java.security.cert.Certificate]
          val key = Tls.pemPrivateKey(keyB64)
          val ks = java.security.KeyStore.getInstance(java.security.KeyStore.getDefaultType)
          ks.load(null, null)
          ks.setKeyEntry("client", key, Array.emptyCharArray, chain)
          val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
            javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
          kmf.init(ks, Array.emptyCharArray)
          kmf.getKeyManagers
        case (None, None) => null
        case _ => throw new IllegalArgumentException(
          "TLS client auth needs BOTH tls.client_cert and tls.client_key")
      }
      val ctx = javax.net.ssl.SSLContext.getInstance("TLSv1.2") // reference MinVersion
      ctx.init(kms, tms, new java.security.SecureRandom())
      ctx
    }
  }

  private object TrustAll extends javax.net.ssl.X509TrustManager {
    override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
    override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
    override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
  }

  /** PEM plumbing for the base64-of-PEM strings the reference config
    * carries (models/configs.go:73-77 root_ca / tls_cert / tls_key). */
  private[kafka] object Tls {
    private def pemBlocks(pem: String, kind: String): Seq[Array[Byte]] = {
      val re = ("-----BEGIN " + kind + "-----([A-Za-z0-9+/=\\s]+?)-----END " + kind + "-----").r
      re.findAllMatchIn(pem).map(m =>
        java.util.Base64.getMimeDecoder.decode(m.group(1).trim)).toSeq
    }

    def pemCertificates(b64: String): Seq[java.security.cert.X509Certificate] = {
      val pem = new String(java.util.Base64.getDecoder.decode(b64),
        java.nio.charset.StandardCharsets.UTF_8)
      val cf = java.security.cert.CertificateFactory.getInstance("X.509")
      val blocks = pemBlocks(pem, "CERTIFICATE")
      if (blocks.isEmpty)
        throw new IllegalArgumentException("no CERTIFICATE blocks in PEM")
      blocks.map(der => cf.generateCertificate(
        new java.io.ByteArrayInputStream(der)).asInstanceOf[java.security.cert.X509Certificate])
    }

    /** PKCS#8 ("PRIVATE KEY") DER → RSA or EC key. */
    def pemPrivateKey(b64: String): java.security.PrivateKey = {
      val pem = new String(java.util.Base64.getDecoder.decode(b64),
        java.nio.charset.StandardCharsets.UTF_8)
      val der = pemBlocks(pem, "PRIVATE KEY").headOption.getOrElse(
        throw new IllegalArgumentException(
          "no PKCS#8 PRIVATE KEY block in PEM (PKCS#1 'RSA PRIVATE KEY' unsupported — re-wrap with openssl pkcs8)"))
      val spec = new java.security.spec.PKCS8EncodedKeySpec(der)
      Seq("RSA", "EC", "Ed25519").view.flatMap { alg =>
        try Some(java.security.KeyFactory.getInstance(alg).generatePrivate(spec))
        catch { case _: java.security.spec.InvalidKeySpecException => None }
      }.headOption.getOrElse(
        throw new IllegalArgumentException("PKCS#8 key is not RSA/EC/Ed25519"))
    }
  }

  final case class SaslConfig(mechanism: String, username: String, password: String) {
    /** InputPartition instances (which embed this) surface in Spark plan
      * descriptions and task-failure messages — never print the secret. */
    override def toString: String = s"SaslConfig($mechanism,$username,*********)"
  }
  final case class BrokerMeta(nodeId: Int, host: String, port: Int)
  final case class PartitionMeta(partition: Int, leader: Int, errorCode: Int)
  final case class TopicMeta(name: String, errorCode: Int, partitions: Seq[PartitionMeta])
  final case class ClusterMeta(brokers: Seq[BrokerMeta], topics: Seq[TopicMeta]) {
    /** Single-topic convenience for the common one-topic read. */
    def topic: TopicMeta = topics.head
  }
  /** `nextOffset` = offset after the last COMPLETE batch in the response
    * (-1 when none decoded); the correct cursor advance even when every
    * record was filtered out (control batch / compacted tail). */
  /** `lastStableOffset` = `highWatermark` unless the broker tracks open
    * transactions below it; under read_committed it is the read ceiling. */
  final case class FetchResult(highWatermark: Long, records: Seq[Records.Record],
                               nextOffset: Long, lastStableOffset: Long = -1L)
}
