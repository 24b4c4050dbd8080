package graft.sources.kafka

import java.net.{InetSocketAddress, Socket}

/** Minimal blocking Kafka client over [[Wire]] — exactly what a consumer
  * needs: ApiVersions (handshake sanity), Metadata v1 (partition discovery),
  * ListOffsets v1 (earliest/latest), Fetch v4 (record batch v2 payloads).
  * One socket per client; [[KafkaWireSource]] opens one per Spark task, the
  * same connection shape as the real consumer's per-partition fetch streams
  * (reference: glassflow-api/internal/kafka/consumer.go fetch config,
  * internal/constants.go:250-259 min 100 KB / max 1 MB / max wait 750 ms —
  * the same defaults used here).
  */
final class WireClient(host: String, port: Int, clientId: String = "graft") extends AutoCloseable {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), 10000)
  socket.setSoTimeout(30000)
  socket.setTcpNoDelay(true)
  private val in = new java.io.BufferedInputStream(socket.getInputStream)
  private val out = new java.io.BufferedOutputStream(socket.getOutputStream)
  private var correlation = 0

  final case class PartitionMeta(partition: Int, leader: Int, errorCode: Int)
  final case class TopicMeta(name: String, errorCode: Int, partitions: Seq[PartitionMeta])

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

  /** Metadata v1 for one topic. */
  def metadata(topic: String): TopicMeta = {
    val r = roundTrip(Wire.ApiMetadata, 1) { w =>
      w.int32(1); w.string(topic); ()
    }
    val brokerCount = r.int32()
    (0 until brokerCount).foreach { _ =>
      r.int32(); r.string(); r.int32(); r.string() // node, host, port, rack
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
    topics.find(_.name == topic).getOrElse(
      throw new java.io.IOException(s"topic $topic absent from metadata response"))
  }

  /** ListOffsets v1: timestamp -1 = latest (log end), -2 = earliest. */
  def listOffsets(topic: String, partitions: Seq[Int], timestamp: Long): Map[Int, Long] = {
    val r = roundTrip(Wire.ApiListOffsets, 1) { w =>
      w.int32(-1) // replica_id
      w.int32(1); w.string(topic)
      w.int32(partitions.size)
      partitions.foreach { p => w.int32(p).int64(timestamp) }
    }
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

  final case class FetchResult(highWatermark: Long, records: Seq[Records.Record])

  /** Fetch v4 from one partition at `offset`. Returns decoded records
    * (CRC-verified) and the partition high watermark. */
  def fetch(topic: String, partition: Int, offset: Long,
            maxBytes: Int = 1 << 20, maxWaitMs: Int = 750, minBytes: Int = 1): FetchResult = {
    val r = roundTrip(Wire.ApiFetch, 4) { w =>
      w.int32(-1)          // replica_id
      w.int32(maxWaitMs)
      w.int32(minBytes)
      w.int32(maxBytes)    // response-level cap (v3+)
      w.int8(0)            // isolation_level: read_uncommitted
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
        r.int64() // last_stable_offset
        val abortedCount = r.int32()
        (0 until math.max(abortedCount, 0)).foreach(_ => { r.int64(); r.int64() })
        val recordSet = r.bytes()
        if (err != 0) throw new java.io.IOException(s"Fetch error $err on partition $pid")
        if (pid == partition)
          result = FetchResult(hwm,
            if (recordSet == null || recordSet.isEmpty) Nil else Records.decodeAll(recordSet))
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
