package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood near-duplicate detection (Hernández & Stolfo,
  * SIGMOD'95) — the classic sort-based alternative to LSH blocking:
  * records sorted by a normalized key land near their duplicates, and
  * only a sliding window of `window` consecutive records is ever
  * compared, so candidate generation is O(n·window) instead of O(n²).
  *
  * The textbook method needs one GLOBAL sort; here the rank runs within
  * PREFIX BLOCKS (first `blockLen` chars of the sort key) — a
  * block-keyed exchange with in-partition sorts, no global ordering
  * anywhere in the plan. Pairs whose members straddle a block boundary
  * are missed by construction: the standard blocking tradeoff (every
  * blocking scheme has one), conventionally mitigated by a second pass
  * under a different key — exactly how multi-band LSH treats the same
  * problem. Candidates are exact-verified (word-set Jaccard), so the
  * output has no false positives.
  *
  * Scale shape: normalization and keying are scan projections; the one
  * exchange is keyed by block; windowed pairing is an equi hash join on
  * (block, rank + offset) — no range residual against possibly large
  * blocks; the verify is scan-local set arithmetic on the joined rows.
  */
object SortedNeighborhood {

  /** Near-dup pairs `(a_id, b_id, jacc_milli)` with word-set Jaccard ≥
    * `jaccardPctMin`% among window-adjacent records. Sort key = first
    * `keyLen` alphanumeric chars of the lowercased text. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            keyLen: Int = 24, blockLen: Int = 6, window: Int = 4,
            jaccardPctMin: Int = 80): DataFrame = {
    require(blockLen <= keyLen && window >= 2)
    import org.apache.spark.sql.expressions.Window
    val t = lower(trim(col(textCol)))
    val keyed = docs.select(col(idCol).as("id"), t.as("t"),
        substring(regexp_replace(t, "[^a-z0-9]+", ""), 1, keyLen).as("sk"))
      .withColumn("blk", substring(col("sk"), 1, blockLen))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("blk")).orderBy(col("sk"), col("id"))))
    val left = keyed.select(col("blk"), col("rn"), col("id").as("a_id"),
        col("t").as("ta"))
      .withColumn("rn2", explode(sequence(
        col("rn") + 1, col("rn") + (window - 1))))
    val cand = left.join(
      keyed.select(col("blk"), col("rn").as("rn2"), col("id").as("b_id"),
        col("t").as("tb")),
      Seq("blk", "rn2"))
    cand
      .withColumn("wa", array_distinct(split(col("ta"), "\\s+")))
      .withColumn("wb", array_distinct(split(col("tb"), "\\s+")))
      .withColumn("i", size(array_intersect(col("wa"), col("wb"))).cast("long"))
      .withColumn("u", size(array_union(col("wa"), col("wb"))).cast("long"))
      .filter(col("i") * 100 >= col("u") * jaccardPctMin)
      .select(col("a_id"), col("b_id"),
        expr("CAST(i * 1000 div u AS BIGINT)").as("jacc_milli"))
  }
}
