package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank (Page/Brin/Motwani/Winograd 1999) over an edge frame, in
  * BIT-DETERMINISTIC integer fixed point — the domain-authority signal a
  * corpus curation pipeline feeds into per-URL quality weights.
  *
  * Ranks are probabilities scaled to micro-units (1e6) and every update is
  * integer arithmetic: per-edge contribution `rank div outdeg`, damping
  * `(85 * contribs) div 100`, teleport `150000 div n`. Integer sums are
  * associative-commutative, so the result is partition- and
  * merge-order-invariant — the same property that makes it expressible as
  * an exact SQL oracle (truncation loses ≤ n·iterations micro-units of
  * probability mass; fine for a ranking signal, and identical in any
  * engine that truncates integer division toward zero on non-negatives).
  *
  * Scale shape per iteration: one hash join of edges against the current
  * rank frame on `src` (both sides hash-partitioned on the same key — at
  * scale, pre-bucket edges by `src` so the join is co-located and only the
  * small rank frame moves), one keyed aggregate onto `dst` with map-side
  * partial sums, one left join back to the node set. Dangling nodes keep
  * the standard simplification (their mass exits; no uniform
  * redistribution pass). Driver holds nothing but the node count.
  */
object PageRank {

  /** `iterations` fixed-point steps over `edges(src, dst)` (duplicates
    * dropped); returns `(id, rank_micro)` for every node. */
  def fixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                 iterations: Int): DataFrame =
    fixedPointKeyed(edges.select(col(srcCol).cast("long").as(srcCol),
      col(dstCol).cast("long").as(dstCol)), srcCol, dstCol, iterations)

  /** [[fixedPoint]] over nodes of ANY key type (strings for word graphs —
    * TextRank — or URLs/domains before an id dictionary exists): the
    * recurrence only ever uses the node key as a join/group key, so no
    * encode/decode pass is needed. At very large scale a dictionary-encoded
    * long key shuffles fewer bytes — that is a caller-side optimization,
    * not a semantic requirement. */
  def fixedPointKeyed(edges: DataFrame, srcCol: String, dstCol: String,
                      iterations: Int): DataFrame = {
    // One checkpoint, one final DAG (r16). Nothing here was materialized
    // before, so under lazy lineage the CALLER's edge build (a join or a
    // tokenize+explode) was re-derived by every reference — nodes, outdeg
    // and each iteration's contribs, ~14 rebuilds at 3 iterations. The
    // edge frame checkpoints once to a flat scan. Everything else stays
    // LAZY on purpose: `rank` is referenced exactly once per iteration,
    // so the lineage is linear (no 3^rounds blow-up — that pathology
    // needs multiple references per round, as in the k-core keep-set),
    // and executing all iterations as ONE physical plan lets Spark reuse
    // the identical per-iteration exchanges (outdeg, e⋈outdeg) instead
    // of running a job per materialization. Deep traversals still bound
    // their plan depth with a periodic checkpoint.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint()
    // one-pass node derivation (a union of two selects scans e twice)
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct()
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val teleport = 150000L / n
    var rank = nodes.withColumn("rank_micro", lit(1000000L / n))
    (1 to iterations).foreach { i =>
      val contribs = e
        .join(outdeg, "src")
        .join(rank.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr("rank_micro div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      rank = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr("85 * coalesce(contrib, 0L) div 100")).as("rank_micro"))
      if (i % 8 == 0) rank = rank.localCheckpoint()
    }
    rank
  }
}
