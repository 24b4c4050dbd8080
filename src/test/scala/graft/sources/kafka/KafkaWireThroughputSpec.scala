package graft.sources.kafka

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import MiniKafkaBroker.Cluster

/** Throughput sanity for the wire source: decode + row materialization must
  * sustain well beyond any broker's per-connection delivery rate, or the
  * client becomes the pipeline bottleneck. The floor asserted here is
  * deliberately loose (CI hosts vary 2.5×); the measured numbers live in
  * SCALE.md. Loopback fixture, so this measures OUR stack (socket framing,
  * CRC32C, varint decode, InternalRow building), not kernel networking. */
class KafkaWireThroughputSpec extends SparkSpec {

  test("batch read sustains >50k rows/s/core through the full wire stack") {
    val c = new Cluster()
    val b = c.addBroker()
    try {
      val parts = 4
      val rowsPerPart = 50000
      val batchSize = 500
      val payload = "x" * 100 // ~100-byte values, a realistic event size
      (0 until parts).foreach { p =>
        c.addPartition("bench", p)
        var off = 0L
        while (off < rowsPerPart) {
          val recs = (0 until batchSize).map(i => Records.Record(off + i,
            1700000000000L + off + i,
            s"k${off + i}".getBytes(StandardCharsets.UTF_8),
            s"$payload-${off + i}".getBytes(StandardCharsets.UTF_8)))
          c.appendRaw("bench", p, off, off + batchSize - 1,
            Records.encodeBatch(off, recs))
          off += batchSize
        }
      }
      val total = parts.toLong * rowsPerPart
      // warm-up pass (JIT, class loading), then the measured pass
      def readAll(): Long = spark.read.format("graft-kafka")
        .option("brokers", b.address).option("topic", "bench").load().count()
      assert(readAll() == total)
      val t0 = System.nanoTime()
      assert(readAll() == total)
      val sec = (System.nanoTime() - t0) / 1e9
      val rate = total / sec
      info(f"wire-source batch read: ${total} rows in $sec%.2f s = $rate%.0f rows/s over $parts connections")
      assert(rate > 50000 * parts,
        f"wire source must beat 50k rows/s/connection; got $rate%.0f over $parts")
    } finally c.stop()
  }
}
