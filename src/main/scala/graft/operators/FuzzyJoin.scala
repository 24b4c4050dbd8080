package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance record linkage (fuzzy self-join): all pairs whose texts
  * are within `maxDist` Levenshtein edits, found WITHOUT the all-pairs
  * cross product.
  *
  * Blocking is by length band and LOSSLESS for this predicate: an edit
  * never changes string length by more than 1, so `dist(a,b) <= maxDist`
  * implies `|len(a) - len(b)| <= maxDist`. With bucket width
  * `w = maxDist + 1`, every partner of a record lies in one of the buckets
  * `floor((len-maxDist)/w) .. floor((len+maxDist)/w)` — the record
  * replicates to exactly that constant-size bucket range (at most 3
  * buckets), partners anchor at their own single bucket, and the equi-join
  * on bucket is a plain hash join. Candidates verify with the exact
  * `levenshtein` (codegen'd built-in); multi-bucket replication dedups on
  * the (smaller, larger) id pair. At 100 TB the shuffle is keyed by
  * bucket — same-length skew (fixed-width codes) is the known hazard and
  * takes the standard salt-the-hot-bucket treatment if it appears.
  */
object FuzzyJoin {

  /** Self-join: distinct pairs (`a_id` < `b_id`) with
    * `levenshtein(text_a, text_b) <= maxDist`, plus the distance. */
  def selfJoin(records: DataFrame, idCol: String, textCol: String,
               maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val w = maxDist + 1
    val base = records.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("string").as("text"),
      length(col(textCol)).cast("long").as("len"))
    // probe side: replicate to every bucket a partner could anchor in
    // (integer `div` truncates toward zero, which coincides with floor on
    // this non-negative bucket domain — a sub-maxDist length just clamps
    // the range start to bucket 0, where the shortest partners anchor)
    val probes = base.withColumn("bucket",
      explode(sequence(expr(s"(len - $maxDist) div $w"),
        expr(s"(len + $maxDist) div $w"))))
    // anchor side: one bucket per record
    val anchors = base
      .withColumn("bucket", expr(s"len div $w"))
      .select(col("bucket"), col("id").as("b_id"), col("text").as("b_text"),
        col("len").as("b_len"))
    probes
      .join(anchors, Seq("bucket"))
      .where(col("id") < col("b_id") &&
        abs(col("len") - col("b_len")) <= maxDist &&
        levenshtein(col("text"), col("b_text")) <= maxDist)
      .select(col("id").as("a_id"), col("b_id"),
        levenshtein(col("text"), col("b_text")).cast("long").as("dist"))
      .distinct()
  }
}
