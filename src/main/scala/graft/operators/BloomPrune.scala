package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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

  /** Membership predicate for the probe side; NULL keys never match (SQL
    * join semantics). The filter is broadcast once per stage, and the probe
    * runs as a scan-local predicate — no shuffle, no per-row JVM boxing
    * beyond the long accessor. */
  def mightContainLong(df: DataFrame, bf: BloomFilter, keyCol: String): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    probe(col(keyCol))
  }

  /** Inner equi-join with the probe side Bloom-pruned first. Build side is
    * broadcast for the exact join (it is small by assumption); swap for a
    * shuffle join at the call site if it is not. */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = buildLong(build, buildKey, expectedItems, fpp)
    probe.filter(mightContainLong(probe, bf, probeKey))
      .join(broadcast(build), col(probeKey) === col(buildKey))
  }
}
