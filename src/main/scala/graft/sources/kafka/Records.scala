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
  * Compression (attributes bits 0-2) is out of scope — both ends of the
  * in-repo wire pair send uncompressed batches, and the decode REJECTS
  * compressed attributes loudly rather than mis-parsing.
  */
object Records {

  final case class Record(
    offset: Long,
    timestampMs: Long,
    key: Array[Byte],   // null = no key
    value: Array[Byte], // null = tombstone
    timestampType: Int = 0) // 0 = CreateTime, 1 = LogAppendTime (batch attr bit 3)

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
  private val ControlBit = 0x20

  /** Encode one uncompressed batch. Offsets are assigned from `baseOffset`
    * in order; timestamps carried per record (CreateTime semantics).
    * `attributes` lets tests build LogAppendTime (0x08) and control (0x20)
    * batches; compression bits are refused on decode so don't set them.
    * `lastOffsetDeltaOverride` (when >= 0) lets tests model a compacted
    * batch whose header still spans offsets the records no longer cover. */
  def encodeBatch(baseOffset: Long, records: Seq[Record], attributes: Int = 0,
                  lastOffsetDeltaOverride: Int = -1): Array[Byte] = {
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
    w.int64(-1L)                  // producerId
    w.int16(-1)                   // producerEpoch
    w.int32(-1)                   // baseSequence
    w.int32(records.size)
    records.foreach { r =>
      val body = new Wire.Writer
      body.int8(0)                               // record attributes
      body.varlong(r.timestampMs - baseTs)
      body.varint((r.offset - baseOffset).toInt) // offsetDelta
      if (r.key == null) body.varint(-1) else { body.varint(r.key.length); body.bytesRaw(r.key) }
      if (r.value == null) body.varint(-1) else { body.varint(r.value.length); body.bytesRaw(r.value) }
      body.varint(0)                             // headers
      val bytes = body.toArray
      w.varint(bytes.length)
      w.bytesRaw(bytes)
    }
    w.patchInt32(lenAt, w.size - lenAt - 4)
    w.patchInt32(crcAt, w.crc32c(crcFrom).toInt)
    w.toArray
  }

  /** Decode every batch in a Fetch record set, VERIFYING each CRC32C —
    * a flipped bit on the wire must surface as an error, not bad rows.
    * Batches truncated by the broker's byte cap (a legal Fetch artifact:
    * the last batch in a response may be partial) are dropped, matching
    * client behavior — the next fetch re-reads them from their offset.
    * CONTROL batches (attributes bit 5 — transaction commit/abort markers
    * on transactional topics) are skipped but still advance `nextOffset`:
    * emitting their marker payloads as rows would be silent corruption
    * (the stock Kafka source skips them the same way). */
  def decodeAll(recordSet: Array[Byte]): Decoded = {
    val out = Vector.newBuilder[Record]
    var at = 0
    var next = -1L
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
        if ((attributes & CompressionMask) != 0)
          throw new java.io.IOException(s"compressed record batch (attributes=$attributes) unsupported")
        val logAppendTime = (attributes & LogAppendTimeBit) != 0
        val isControl = (attributes & ControlBit) != 0
        val lastOffsetDelta = r.int32()
        val baseTs = r.int64()
        val maxTs = r.int64()
        r.skip(8 + 2 + 4) // producerId, producerEpoch, baseSequence
        val count = r.int32()
        var i = 0
        while (i < count) {
          val len = r.varint()
          val bodyEnd = r.pos + len
          if (!isControl) {
            r.skip(1) // record attributes
            val tsDelta = r.varlong()
            val offDelta = r.varint()
            val keyLen = r.varint()
            val key = if (keyLen < 0) null else r.raw(keyLen)
            val valLen = r.varint()
            val value = if (valLen < 0) null else r.raw(valLen)
            // LogAppendTime batches carry the broker's append time in
            // maxTimestamp; per-record deltas are producer noise then.
            val ts = if (logAppendTime) maxTs else baseTs + tsDelta
            out += Record(baseOffset + offDelta, ts, key, value,
              if (logAppendTime) 1 else 0)
          }
          r.pos = bodyEnd // headers (and any future fields) skipped wholesale
          i += 1
        }
        next = math.max(next, baseOffset + lastOffsetDelta + 1)
        at = end
      }
    }
    Decoded(out.result(), next)
  }
}
