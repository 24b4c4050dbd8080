package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning (a hand-rolled runtime filter).
  *
  * For a selective join — a big fact table against a filtered dimension —
  * the dominant cost at scale is shuffling fact rows that will never find a
  * match. A Bloom filter built over the (small) build side's join keys and
  * applied as a scan-side predicate on the probe side drops most
  * non-matching rows before the shuffle, at a fixed few-hundred-KB broadcast
  * cost. This is exactly what Spark's own runtime-filter rule
  * (`InjectRuntimeFilter`) does for eligible shapes; this operator makes the
  * pattern available explicitly, e.g. for multi-stage pipelines where the
  * build side is computed once and reused across several probe queries.
  *
  * Guarantees (from the Bloom construction): never a false negative — every
  * true match survives the prefilter — and a false-positive rate close to
  * the configured `fpp` while item count stays within `expectedItems`.
  * False positives only cost shuffle volume; the exact join behind the
  * filter removes them, so results are identical to the unpruned join.
  */
object BloomPrune {

  /** Build a Bloom filter over the build side's long key column. Runs one
    * Spark aggregation job over the build side (the small side by
    * assumption) and returns the driver-side sketch — bounded size
    * (~1.2 MB at 1M items / 1% fpp), the same class of driver state as any
    * broadcast hash relation. */
  def buildLong(build: DataFrame, keyCol: String, expectedItems: Long,
                fpp: Double = 0.01): BloomFilter =
    build.stat.bloomFilter(keyCol, math.max(expectedItems, 1L), fpp)

  /** Membership predicate for the probe side: Spark's own codegen'd
    * `BloomFilterMightContain` expression — the one `InjectRuntimeFilter`
    * plants — over the serialized filter as a binary literal, so the probe
    * stays inside whole-stage codegen instead of crossing a UDF boundary
    * per row. NULL keys yield NULL, which a filter drops (SQL join
    * semantics). The literal ships with the task binary — fine at runtime-
    * filter sizes (~1.2 MB / 1M keys); beyond that, prune build-side keys
    * first. */
  def mightContainLong(bf: BloomFilter, keyCol: String): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      GraftColumnBridge.expression(col(keyCol))))
  }

  /** Inner equi-join with the probe side Bloom-pruned first. Build side is
    * broadcast for the exact join (it is small by assumption); swap for a
    * shuffle join at the call site if it is not. */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = buildLong(build, buildKey, expectedItems, fpp)
    probe.filter(mightContainLong(bf, probeKey))
      .join(broadcast(build), col(probeKey) === col(buildKey))
  }
}
