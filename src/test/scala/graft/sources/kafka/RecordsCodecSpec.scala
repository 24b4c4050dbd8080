package graft.sources.kafka

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import MiniKafkaBroker.Cluster

/** Compressed record-batch codec coverage: all four Kafka codecs
  * (gzip/snappy/lz4/zstd — Kafka CompressionType ids 1-4) round-trip
  * through the v2 batch encoder/decoder with CRC intact, and a compressed
  * batch served by the broker reads end-to-end through
  * `format("graft-kafka")`. */
class RecordsCodecSpec extends SparkSpec {

  private def recs(n: Int): Seq[Records.Record] =
    (0 until n).map(i => Records.Record(i.toLong, 1700000000000L + i,
      s"key$i".getBytes(StandardCharsets.UTF_8),
      (s"value-$i-" + ("x" * 64)).getBytes(StandardCharsets.UTF_8)))

  private val codecs = Seq(
    "gzip" -> Records.CodecGzip, "snappy" -> Records.CodecSnappy,
    "lz4" -> Records.CodecLz4, "zstd" -> Records.CodecZstd)

  for ((name, codec) <- codecs) {
    test(s"$name batch round-trips with CRC and compresses repetitive payloads") {
      val rs = recs(50)
      val packed = Records.encodeBatch(0L, rs, attributes = codec)
      val plain = Records.encodeBatch(0L, rs)
      assert(packed.length < plain.length, s"$name should shrink 64-byte-run payloads")
      val dec = Records.decodeAll(packed)
      assert(dec.nextOffset == 50L)
      assert(dec.records.map(_.offset) == (0L until 50L))
      assert(dec.records.map(r => new String(r.value, StandardCharsets.UTF_8)) ==
        rs.map(r => new String(r.value, StandardCharsets.UTF_8)))
      assert(new String(dec.records.head.key, StandardCharsets.UTF_8) == "key0")
      assert(dec.records.map(_.timestampMs) == rs.map(_.timestampMs))
    }
  }

  test("a flipped bit in a compressed batch still dies on CRC, not a codec error") {
    val packed = Records.encodeBatch(0L, recs(10), attributes = Records.CodecGzip)
    packed(packed.length - 3) = (packed(packed.length - 3) ^ 0x40).toByte
    val ex = intercept[java.io.IOException](Records.decodeAll(packed))
    assert(ex.getMessage.contains("CRC"))
  }

  test("unknown codec id fails loudly instead of mis-parsing") {
    // attributes bits 0-2 = 5: reserved/unknown. Build an uncompressed
    // batch then patch the attributes AND recompute the CRC so the decode
    // reaches the codec dispatch.
    val packed = Records.encodeBatch(0L, recs(3))
    packed(21) = 0; packed(22) = 5 // attributes int16 sits at bytes 21-22
    val crc = new java.util.zip.CRC32C
    crc.update(packed, 21, packed.length - 21)
    val v = crc.getValue.toInt
    packed(17) = (v >> 24).toByte; packed(18) = (v >> 16).toByte
    packed(19) = (v >> 8).toByte; packed(20) = v.toByte
    val ex = intercept[java.io.IOException](Records.decodeAll(packed))
    assert(ex.getMessage.contains("unknown compression codec 5"), ex.getMessage)
  }

  test("a truncated trailing batch is dropped cleanly and re-fetched from its offset") {
    // real brokers cut the LAST batch of a response at the byte cap; the
    // decoder must surface the complete batches and set the cursor so the
    // next fetch re-reads the partial one — not throw, not emit junk
    val full = Records.encodeBatch(0L, recs(3))
    val next = Records.encodeBatch(3L, recs(2).map(r => r.copy(offset = r.offset + 3)))
    val truncated = java.util.Arrays.copyOf(next, next.length / 2)
    val wire = full ++ truncated
    val dec = Records.decodeAll(wire)
    assert(dec.records.map(_.offset) == (0L until 3L))
    assert(dec.nextOffset == 3L, "cursor stops at the last COMPLETE batch")
  }

  test("mixed codec batches in one partition read end-to-end through spark") {
    val c = new Cluster()
    val b = c.addBroker()
    try {
      c.addPartition("t", 0)
      var base = 0L
      for ((_, codec) <- ("none" -> Records.CodecNone) +: codecs) {
        val rs = (0 until 4).map(i => Records.Record(base + i, 1700000000000L,
          null, s"c$codec-$i".getBytes(StandardCharsets.UTF_8)))
        c.appendRaw("t", 0, base, base + 3,
          Records.encodeBatch(base, rs, attributes = codec))
        base += 4
      }
      val rows = spark.read.format("graft-kafka")
        .option("brokers", b.address).option("topic", "t").load().collect()
        .sortBy(_.getLong(4))
      assert(rows.length == 20)
      assert(rows.map(_.getLong(4)).toSeq == (0L until 20L))
      val vals = rows.map(r => new String(r.getAs[Array[Byte]]("value"),
        StandardCharsets.UTF_8))
      assert(vals(0) == "c0-0" && vals(4) == "c1-0" && vals(8) == "c2-0" &&
        vals(12) == "c3-0" && vals(16) == "c4-0")
    } finally c.stop()
  }
}
