package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance record linkage (fuzzy self-join): all pairs whose texts
  * are within `maxDist` Levenshtein edits, found WITHOUT the all-pairs
  * cross product.
  *
  * Blocking is the PassJoin pigeonhole scheme (Li/Deng/Feng, VLDB'12 —
  * public): split every string into k = maxDist+1 contiguous segments; if
  * dist(a,b) <= maxDist then at least one segment of `a` carries ZERO
  * edits, i.e. appears in `b` verbatim at a position shifted by at most
  * maxDist. So `a` emits its k segments keyed by (len(a), segIdx,
  * content), `b` emits the substrings any length-ℓ partner's segment
  * could align to — ℓ over [len(b)-maxDist, len(b)+maxDist], each segIdx,
  * each shift in [-maxDist, +maxDist] — and the equi-join on that key is
  * a plain hash join whose selectivity follows CONTENT, not length.
  * (Length banding alone is a trap: fixed-length keys — codes, prefixes,
  * hashes — collapse into one bucket and the join degenerates to the
  * cross product; measured 113 s at sf0.1 before this rewrite.)
  * Candidates verify with the codegen'd threshold-banded `levenshtein`
  * (Ukkonen band, early exit past maxDist) and dedup on the (smaller,
  * larger) id pair.
  *
  * Constant fanout: k keys on the segment side; at most
  * (2·maxDist+1)² · k substring keys on the probe side (75 for
  * maxDist=2). Strings shorter than k can have empty segments, which the
  * pigeonhole argument does not cover once filtered — they take a
  * brute-force branch against the (equally short, by the length filter)
  * partner set instead; in a realistic corpus that set is negligible.
  */
object FuzzyJoin {

  /** Self-join: distinct pairs (`a_id` < `b_id`) with
    * `levenshtein(text_a, text_b) <= maxDist`, plus the distance. */
  def selfJoin(records: DataFrame, idCol: String, textCol: String,
               maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val k = maxDist + 1
    val base = records.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("string").as("text"),
      length(col(textCol)).cast("long").as("len"))

    // even split of a length-l string: segment i of k has
    //   segLen(l,i) = l div k + (1 if i < l mod k else 0)
    //   segStart(l,i) = i * (l div k) + min(i, l mod k)       (0-based)
    def segLen(l: String, i: String) =
      s"($l div $k + (CASE WHEN $i < $l % $k THEN 1 ELSE 0 END))"
    def segStart(l: String, i: String) =
      s"($i * ($l div $k) + least($i, $l % $k))"

    val long = base.where(col("len") >= k)
    // anchor side: own k segments, keyed by own length
    val segs = long
      .select(col("id"), col("text"), col("len"),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("i"))
      .select(col("id"), col("text"), col("len"), col("len").as("lc"), col("i"),
        expr(s"substring(text, CAST(${segStart("len", "i")} + 1 AS INT), " +
          s"CAST(${segLen("len", "i")} AS INT))").as("seg"))
      .where(length(col("seg")) >= 1)
    // probe side: substrings a length-lc partner's segment i could equal,
    // for every candidate partner length and alignment shift
    val subs = long
      .select(col("id").as("b_id"), col("text").as("b_text"),
        col("len").as("b_len"),
        explode(sequence(col("len") - maxDist, col("len") + maxDist)).as("lc"))
      .where(col("lc") >= k)
      .select(col("b_id"), col("b_text"), col("b_len"), col("lc"),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("i"))
      .select(col("b_id"), col("b_text"), col("b_len"), col("lc"), col("i"),
        explode(sequence(lit(-maxDist.toLong), lit(maxDist.toLong))).as("shift"))
      .select(col("b_id"), col("b_text"), col("b_len"), col("lc"), col("i"),
        (expr(segStart("lc", "i")) + col("shift")).as("pos"),
        expr(segLen("lc", "i")).as("slen"))
      .where(col("pos") >= 0 && col("pos") + col("slen") <= col("b_len") &&
        col("slen") >= 1)
      .select(col("b_id"), col("b_text"), col("b_len"), col("lc"), col("i"),
        expr("substring(b_text, CAST(pos + 1 AS INT), CAST(slen AS INT))").as("seg"))
    val longPairs = segs
      .join(subs, Seq("lc", "i", "seg"))
      .where(col("id") =!= col("b_id") &&
        abs(col("len") - col("b_len")) <= maxDist)
      .select(least(col("id"), col("b_id")).as("a_id"),
        greatest(col("id"), col("b_id")).as("b_id"),
        col("text"), col("b_text"))

    // short strings (len < k): segments can be empty, pigeonhole does not
    // apply — brute them against everything short enough to be a partner
    val short = base.where(col("len") < k)
    val shortPartners = base.where(col("len") < (k + maxDist).toLong)
      .select(col("id").as("b_id"), col("text").as("b_text"))
    val shortPairs = short
      .crossJoin(shortPartners)
      .where(col("id") =!= col("b_id"))
      .select(least(col("id"), col("b_id")).as("a_id"),
        greatest(col("id"), col("b_id")).as("b_id"),
        col("text"), col("b_text"))

    // threshold form: Ukkonen-banded O(maxDist·len) DP with early exit
    // (returns −1 past the threshold) instead of the full O(len²) table —
    // and computed ONCE per candidate instead of once in the filter and
    // again in the projection
    longPairs.union(shortPairs)
      .withColumn("__d",
        levenshtein(col("text"), col("b_text"), maxDist))
      .where(col("__d") >= 0)
      .select(col("a_id"), col("b_id"), col("__d").cast("long").as("dist"))
      .distinct()
  }
}
