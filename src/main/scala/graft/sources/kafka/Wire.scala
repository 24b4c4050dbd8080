package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** Kafka wire-protocol primitives (big-endian, length-framed), per the
  * public protocol guide (kafka.apache.org/protocol). This repo carries its
  * own implementation because the build sandbox has no Kafka client or
  * connector artifact — the protocol itself is small and fully specified,
  * so the source can still be driven over a REAL TCP socket
  * (see [[KafkaWireSource]] / MiniKafkaBroker in tests) instead of leaving
  * the reference's front door (glassflow-api/internal/kafka/consumer.go)
  * string-tested only.
  *
  * Scope: the fixed pre-flexible (non-tagged-field) versions of the four
  * APIs a consumer needs — ApiVersions v0, Metadata v1, ListOffsets v1,
  * Fetch v4 — plus record batch magic v2. These are real protocol versions
  * every broker since 0.11 serves, not a private dialect.
  */
private[kafka] object Wire {

  /** Growable big-endian writer with Kafka's primitive vocabulary. */
  final class Writer {
    private var buf = new Array[Byte](256)
    private var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > buf.length) {
        var cap = buf.length * 2
        while (cap < pos + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    def size: Int = pos
    def int8(v: Int): this.type = { ensure(1); buf(pos) = v.toByte; pos += 1; this }
    def int16(v: Int): this.type = { ensure(2); buf(pos) = (v >> 8).toByte; buf(pos + 1) = v.toByte; pos += 2; this }
    def int32(v: Int): this.type = {
      ensure(4)
      buf(pos) = (v >> 24).toByte; buf(pos + 1) = (v >> 16).toByte
      buf(pos + 2) = (v >> 8).toByte; buf(pos + 3) = v.toByte
      pos += 4; this
    }
    def int64(v: Long): this.type = { int32((v >> 32).toInt); int32(v.toInt) }
    /** Unsigned 32-bit (the record-batch CRC slot). */
    def uint32(v: Long): this.type = int32(v.toInt)
    def bytesRaw(b: Array[Byte], off: Int, len: Int): this.type = {
      ensure(len); System.arraycopy(b, off, buf, pos, len); pos += len; this
    }
    def bytesRaw(b: Array[Byte]): this.type = bytesRaw(b, 0, b.length)
    /** STRING: int16 length + UTF-8 (length -1 = null). */
    def string(s: String): this.type =
      if (s == null) int16(-1)
      else { val b = s.getBytes(StandardCharsets.UTF_8); int16(b.length); bytesRaw(b) }
    /** BYTES: int32 length + payload (length -1 = null). */
    def bytes(b: Array[Byte]): this.type =
      if (b == null) int32(-1) else { int32(b.length); bytesRaw(b) }
    /** Zigzag varint (protobuf encoding — what record batch v2 records use). */
    def varint(v: Int): this.type = uvarlong(((v << 1) ^ (v >> 31)).toLong & 0xffffffffL)
    def varlong(v: Long): this.type = uvarlong((v << 1) ^ (v >> 63))
    private def uvarlong(v0: Long): this.type = {
      var v = v0
      while ((v & ~0x7fL) != 0) { int8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      int8(v.toInt)
    }
    /** Patch a previously-written int32 slot (for back-filled lengths). */
    def patchInt32(at: Int, v: Int): Unit = {
      buf(at) = (v >> 24).toByte; buf(at + 1) = (v >> 16).toByte
      buf(at + 2) = (v >> 8).toByte; buf(at + 3) = v.toByte
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, pos)
    /** CRC32C over [from, size) — the record-batch checksum algorithm. */
    def crc32c(from: Int): Long = {
      val c = new java.util.zip.CRC32C
      c.update(buf, from, pos - from)
      c.getValue
    }
  }

  /** Cursor reader over one response/request frame. */
  final class Reader(val buf: Array[Byte], var pos: Int = 0) {
    def remaining: Int = buf.length - pos
    def int8(): Int = { val v = buf(pos); pos += 1; v }
    def int16(): Int = { val v = ((buf(pos) & 0xff) << 8) | (buf(pos + 1) & 0xff); pos += 2; v.toShort.toInt }
    def int32(): Int = {
      val v = ((buf(pos) & 0xff) << 24) | ((buf(pos + 1) & 0xff) << 16) |
        ((buf(pos + 2) & 0xff) << 8) | (buf(pos + 3) & 0xff)
      pos += 4; v
    }
    def int64(): Long = { val hi = int32().toLong; val lo = int32().toLong & 0xffffffffL; (hi << 32) | lo }
    def uint32(): Long = int32().toLong & 0xffffffffL
    def string(): String = {
      val len = int16()
      if (len < 0) null
      else { val s = new String(buf, pos, len, StandardCharsets.UTF_8); pos += len; s }
    }
    def bytes(): Array[Byte] = {
      val len = int32()
      if (len < 0) null
      else { val b = java.util.Arrays.copyOfRange(buf, pos, pos + len); pos += len; b }
    }
    def raw(len: Int): Array[Byte] = {
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + len); pos += len; b
    }
    def varint(): Int = { val v = uvarlong(); (((v >>> 1) ^ -(v & 1)) & 0xffffffffL).toInt }
    def varlong(): Long = { val v = uvarlong(); (v >>> 1) ^ -(v & 1) }
    private def uvarlong(): Long = {
      var v = 0L; var shift = 0
      var b = buf(pos); pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7
        b = buf(pos); pos += 1
      }
      v | ((b & 0x7fL) << shift)
    }
    def skip(n: Int): Unit = pos += n
  }

  /** One length-framed message: int32 size prefix + payload. */
  def writeFrame(out: OutputStream, payload: Array[Byte]): Unit = {
    val d = new DataOutputStream(out)
    d.writeInt(payload.length)
    d.write(payload)
    d.flush()
  }

  def readFrame(in: InputStream): Array[Byte] = {
    val d = new DataInputStream(in)
    val size = d.readInt()
    if (size < 0 || size > 128 * 1024 * 1024)
      throw new java.io.IOException(s"kafka wire: bad frame size $size")
    val buf = new Array[Byte](size)
    d.readFully(buf)
    buf
  }

  /** Read exactly one frame or None at clean EOF (connection closed). */
  def tryReadFrame(in: InputStream): Option[Array[Byte]] =
    try Some(readFrame(in)) catch { case _: EOFException => None }

  // API keys (public constants from the protocol guide)
  val ApiProduce = 0
  val ApiFetch = 1
  val ApiListOffsets = 2
  val ApiMetadata = 3
  val ApiOffsetCommit = 8
  val ApiOffsetFetch = 9
  val ApiFindCoordinator = 10
  val ApiSaslHandshake = 17
  val ApiVersions = 18
  val ApiInitProducerId = 22
  val ApiAddPartitionsToTxn = 24
  val ApiEndTxn = 26
  val ApiSaslAuthenticate = 36

  /** Request header v1: api_key, api_version, correlation_id, client_id. */
  def requestHeader(w: Writer, apiKey: Int, apiVersion: Int, correlationId: Int, clientId: String): Unit = {
    w.int16(apiKey).int16(apiVersion).int32(correlationId).string(clientId)
    ()
  }
}
