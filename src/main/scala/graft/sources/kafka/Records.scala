package graft.sources.kafka

/** Record batch magic v2 — the on-wire (and on-disk) message format every
  * broker has produced since Kafka 0.11, specified publicly in the protocol
  * guide's "Record Batch" section. Layout:
  *
  * {{{
  * baseOffset: int64            | batchLength: int32 (bytes AFTER this field)
  * partitionLeaderEpoch: int32  | magic: int8 = 2
  * crc: uint32                  | — CRC32C over attributes..end (NOT the
  * attributes: int16            |   fields before crc, which brokers rewrite)
  * lastOffsetDelta: int32
  * baseTimestamp: int64         | maxTimestamp: int64
  * producerId: int64            | producerEpoch: int16 | baseSequence: int32
  * recordCount: int32           | records…
  * }}}
  *
  * Each record: varint length, int8 attributes, varlong timestampDelta,
  * varint offsetDelta, varint keyLen (+key), varint valueLen (+value),
  * varint headerCount (+ headers). All varints zigzag-encoded.
  *
  * Compression (attributes bits 0-2): the records block after the 61-byte
  * batch header is compressed AS ONE UNIT with the codec named in the
  * attributes — gzip (1), snappy (2, xerial stream framing), lz4 (3,
  * standard LZ4 frame), zstd (4) — exactly the four codecs Kafka's
  * CompressionType enumerates; the header itself (through recordCount)
  * and the CRC are over the stored (compressed) bytes. All four decode
  * here via libraries Spark itself ships (snappy-java, lz4-java,
  * zstd-jni), so a topic produced with any standard codec reads without
  * broker-side recompression; an unknown codec id fails loudly.
  */
object Records {

  final case class Record(
    offset: Long,
    timestampMs: Long,
    key: Array[Byte],   // null = no key
    value: Array[Byte], // null = tombstone
    timestampType: Int = 0, // 0 = CreateTime, 1 = LogAppendTime (batch attr bit 3)
    headers: Seq[(String, Array[Byte])] = Nil) // record headers (value null allowed)

  /** Result of decoding a Fetch record set: the data records (control
    * batches excluded) plus the offset AFTER the last COMPLETE batch —
    * which can be ahead of the last record's offset (control batches
    * carry no data rows; compaction can remove a batch's tail records
    * while the batch header's lastOffsetDelta still covers them). The
    * fetch loop must advance by `nextOffset`, not by record offsets,
    * or an all-control / fully-compacted batch re-fetches forever. */
  final case class Decoded(records: Seq[Record], nextOffset: Long)

  /** Batch attributes bits (protocol guide "Record Batch" attributes). */
  private val CompressionMask = 0x07
  private val LogAppendTimeBit = 0x08
  val TransactionalBit = 0x10
  val ControlBit = 0x20

  /** Codec ids (attributes bits 0-2), per Kafka's CompressionType. */
  val CodecNone = 0
  val CodecGzip = 1
  val CodecSnappy = 2
  val CodecLz4 = 3
  val CodecZstd = 4

  private def compress(codec: Int, raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val out: java.io.OutputStream = codec match {
      case CodecGzip => new java.util.zip.GZIPOutputStream(bos)
      case CodecSnappy => new org.xerial.snappy.SnappyOutputStream(bos)
      case CodecLz4 => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      case CodecZstd => new com.github.luben.zstd.ZstdOutputStream(bos)
      case other => throw new IllegalArgumentException(s"unsupported record-batch codec $other")
    }
    out.write(raw); out.close()
    bos.toByteArray
  }

  private def decompress(codec: Int, packed: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val bis = new java.io.ByteArrayInputStream(packed, off, len)
    val in: java.io.InputStream = codec match {
      case CodecGzip => new java.util.zip.GZIPInputStream(bis)
      case CodecSnappy => new org.xerial.snappy.SnappyInputStream(bis)
      case CodecLz4 => new net.jpountz.lz4.LZ4FrameInputStream(bis)
      case CodecZstd => new com.github.luben.zstd.ZstdInputStream(bis)
      case other => throw new java.io.IOException(
        s"record batch uses unknown compression codec $other (attributes bits 0-2)")
    }
    try in.readAllBytes() finally in.close()
  }

  /** Encode one uncompressed batch. Offsets are assigned from `baseOffset`
    * in order; timestamps carried per record (CreateTime semantics).
    * `attributes` lets tests build LogAppendTime (0x08) and control (0x20)
    * batches; compression bits are refused on decode so don't set them.
    * `lastOffsetDeltaOverride` (when >= 0) lets tests model a compacted
    * batch whose header still spans offsets the records no longer cover. */
  def encodeBatch(baseOffset: Long, records: Seq[Record], attributes: Int = 0,
                  lastOffsetDeltaOverride: Int = -1, producerId: Long = -1L,
                  baseSequence: Int = -1, producerEpoch: Int = Int.MinValue): Array[Byte] = {
    require(records.nonEmpty, "record batch must carry at least one record")
    val baseTs = records.map(_.timestampMs).min
    val maxTs = records.map(_.timestampMs).max
    val w = new Wire.Writer
    w.int64(baseOffset)
    val lenAt = w.size
    w.int32(0)                    // batchLength, patched below
    w.int32(-1)                   // partitionLeaderEpoch
    w.int8(2)                     // magic
    val crcAt = w.size
    w.uint32(0L)                  // crc, patched below
    val crcFrom = w.size
    w.int16(attributes)
    w.int32(if (lastOffsetDeltaOverride >= 0) lastOffsetDeltaOverride
            else records.size - 1) // lastOffsetDelta
    w.int64(baseTs)
    w.int64(maxTs)
    w.int64(producerId)
    // broker-assigned epoch: fencing depends on stamping the REAL one, not 0
    w.int16(if (producerEpoch != Int.MinValue) producerEpoch
            else if (producerId >= 0) 0 else -1)
    w.int32(baseSequence)
    w.int32(records.size)
    val recs = new Wire.Writer
    records.foreach { r =>
      val body = new Wire.Writer
      body.int8(0)                               // record attributes
      body.varlong(r.timestampMs - baseTs)
      body.varint((r.offset - baseOffset).toInt) // offsetDelta
      if (r.key == null) body.varint(-1) else { body.varint(r.key.length); body.bytesRaw(r.key) }
      if (r.value == null) body.varint(-1) else { body.varint(r.value.length); body.bytesRaw(r.value) }
      body.varint(r.headers.size)
      r.headers.foreach { case (hk, hv) =>
        val kb = hk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        body.varint(kb.length); body.bytesRaw(kb)
        if (hv == null) body.varint(-1) else { body.varint(hv.length); body.bytesRaw(hv) }
      }
      val bytes = body.toArray
      recs.varint(bytes.length)
      recs.bytesRaw(bytes)
    }
    val codec = attributes & CompressionMask
    val recBytes = recs.toArray
    w.bytesRaw(if (codec == CodecNone) recBytes else compress(codec, recBytes))
    w.patchInt32(lenAt, w.size - lenAt - 4)
    w.patchInt32(crcAt, w.crc32c(crcFrom).toInt)
    w.toArray
  }

  /** Encode a transaction-marker CONTROL batch (attributes bits 4+5) for
    * `producerId` at `offset`: one record whose key is (version:int16=0,
    * type:int16 — 1 COMMIT / 0 ABORT), the public control-record schema.
    * Brokers write these when a transaction ends; clients never see their
    * payload as rows, but read_committed clients use the ABORT marker to
    * know an aborted producer's batches have all been seen. */
  def encodeControl(offset: Long, producerId: Long, commit: Boolean,
                    timestampMs: Long = 1700000000000L): Array[Byte] = {
    val key = Array[Byte](0, 0, 0, if (commit) 1 else 0)
    encodeBatch(offset, Seq(Record(offset, timestampMs, key, Array.emptyByteArray)),
      attributes = ControlBit | TransactionalBit, producerId = producerId)
  }

  /** Decode every batch in a Fetch record set, VERIFYING each CRC32C —
    * a flipped bit on the wire must surface as an error, not bad rows.
    * Batches truncated by the broker's byte cap (a legal Fetch artifact:
    * the last batch in a response may be partial) are dropped, matching
    * client behavior — the next fetch re-reads them from their offset.
    * CONTROL batches (attributes bit 5 — transaction commit/abort markers
    * on transactional topics) are skipped but still advance `nextOffset`:
    * emitting their marker payloads as rows would be silent corruption
    * (the stock Kafka source skips them the same way).
    *
    * read_committed (`readCommitted=true` + the Fetch response's
    * `aborted` list of (producerId, firstOffset)): a transactional data
    * batch whose producer appears in `aborted` with firstOffset ≤ the
    * batch's baseOffset is DROPPED — its rows were written by a
    * transaction that aborted — until that producer's ABORT control
    * marker is passed, which ends the aborted span. This is the public
    * client-side filtering algorithm (KafkaConsumer's aborted-transaction
    * index search); offsets still advance over dropped batches, so
    * checkpoint positions are identical in both isolation modes. */
  def decodeAll(recordSet: Array[Byte], aborted: Seq[(Long, Long)] = Nil,
                readCommitted: Boolean = false): Decoded = {
    val out = Vector.newBuilder[Record]
    var at = 0
    var next = -1L
    // aborted txns not yet reached, cheapest-first; producers currently
    // inside an aborted span
    var pending = aborted.sortBy(_._2).toList
    val activeAborted = scala.collection.mutable.Set[Long]()
    while (recordSet.length - at >= 12) {
      val head = new Wire.Reader(recordSet, at)
      val baseOffset = head.int64()
      val batchLength = head.int32()
      if (batchLength < 49 || head.pos + batchLength > recordSet.length) {
        // partial trailing batch — stop cleanly
        at = recordSet.length
      } else {
        val r = new Wire.Reader(recordSet, head.pos)
        val end = head.pos + batchLength
        r.skip(4) // partitionLeaderEpoch
        val magic = r.int8()
        if (magic != 2)
          throw new java.io.IOException(s"record batch magic $magic unsupported (expected v2)")
        val crc = r.uint32()
        val crcCheck = new java.util.zip.CRC32C
        crcCheck.update(recordSet, r.pos, end - r.pos)
        if (crcCheck.getValue != crc)
          throw new java.io.IOException(
            f"record batch CRC mismatch at offset $baseOffset: wire=0x$crc%08x computed=0x${crcCheck.getValue}%08x")
        val attributes = r.int16()
        val codec = attributes & CompressionMask
        val logAppendTime = (attributes & LogAppendTimeBit) != 0
        val isControl = (attributes & ControlBit) != 0
        val isTransactional = (attributes & TransactionalBit) != 0
        val lastOffsetDelta = r.int32()
        val baseTs = r.int64()
        val maxTs = r.int64()
        val producerId = r.int64()
        r.skip(2 + 4) // producerEpoch, baseSequence
        val count = r.int32()
        if (readCommitted) {
          // aborted txns whose first offset precedes this batch are now live
          while (pending.nonEmpty && pending.head._2 <= baseOffset) {
            activeAborted += pending.head._1
            pending = pending.tail
          }
        }
        val dropAborted = readCommitted && isTransactional && !isControl &&
          activeAborted.contains(producerId)
        if (dropAborted) {
          // the whole batch is discarded and no marker state can change
          // inside a data batch — skip the decompress + record walk
          // entirely (aborted volume costs ~zero CPU, not proportional CPU)
          next = math.max(next, baseOffset + lastOffsetDelta + 1)
          at = end
        } else {
        // the records block (everything after recordCount, up to the batch
        // end) is compressed as one unit; the header above never is
        val rr = if (codec == CodecNone) r
          else new Wire.Reader(decompress(codec, recordSet, r.pos, end - r.pos))
        var i = 0
        while (i < count) {
          val len = rr.varint()
          val bodyEnd = rr.pos + len
          if (isControl && readCommitted) {
            // control-record key: version int16, type int16 (0 ABORT /
            // 1 COMMIT) — an ABORT marker closes its producer's aborted span
            rr.skip(1)   // record attributes
            rr.varlong() // timestampDelta
            rr.varint()  // offsetDelta
            val keyLen = rr.varint()
            val key = if (keyLen < 0) null else rr.raw(keyLen)
            if (key != null && key.length >= 4) {
              val markerType = ((key(2) & 0xff) << 8) | (key(3) & 0xff)
              if (markerType == 0) activeAborted -= producerId
            }
          } else if (!isControl && !dropAborted) {
            rr.skip(1) // record attributes
            val tsDelta = rr.varlong()
            val offDelta = rr.varint()
            val keyLen = rr.varint()
            val key = if (keyLen < 0) null else rr.raw(keyLen)
            val valLen = rr.varint()
            val value = if (valLen < 0) null else rr.raw(valLen)
            val headerCount = rr.varint()
            val headers = (0 until math.max(headerCount, 0)).map { _ =>
              val hk = new String(rr.raw(rr.varint()),
                java.nio.charset.StandardCharsets.UTF_8)
              val hvLen = rr.varint()
              hk -> (if (hvLen < 0) null else rr.raw(hvLen))
            }
            // LogAppendTime batches carry the broker's append time in
            // maxTimestamp; per-record deltas are producer noise then.
            val ts = if (logAppendTime) maxTs else baseTs + tsDelta
            out += Record(baseOffset + offDelta, ts, key, value,
              if (logAppendTime) 1 else 0, headers)
          }
          rr.pos = bodyEnd // headers (and any future fields) skipped wholesale
          i += 1
        }
        next = math.max(next, baseOffset + lastOffsetDelta + 1)
        at = end
        }
      }
    }
    Decoded(out.result(), next)
  }
}
