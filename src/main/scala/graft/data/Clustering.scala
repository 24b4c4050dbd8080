package graft.data

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, and the
  * near-duplicate cluster assignment a training-data pipeline builds on it:
  * pairwise dup edges (from MinHash/SimHash/n-gram/embedding dedup) →
  * transitive cluster id → one representative document per cluster.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC 2014). Each
  * round is two join+aggregate passes over the CURRENT edge set — never the
  * corpus, never a materialized neighborhood list — and converges in
  * O(log² n) rounds worst-case (a handful in practice). Min-label
  * propagation would need O(diameter) rounds, pathological on chain-shaped
  * near-dup sets (a≈b≈c≈… with drift), which is exactly the shape crawl
  * dedup produces; the star algorithms contract chains exponentially.
  * At 100 TB the edge set (dup pairs only) is orders of magnitude smaller
  * than the corpus, and every pass is a keyed shuffle with map-side
  * combine — no driver-side state beyond a 4-value convergence signature.
  */
object Clustering {

  /** Undirected (srcCol, dstCol) long-id edges → (id, cluster_id) where
    * cluster_id is the minimum id in the component. Only ids appearing in
    * `edges` are present — callers join back to the full table (see
    * [[assignClusters]]). Self-loops are ignored. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 25,
                          localThreshold: Long = 1L << 20): DataFrame = {
    var cur = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true) // truncate lineage: each round re-plans from here
    var sig = signature(cur)
    // Below ~10⁶ edges the per-round scheduling of the star algorithm costs
    // more than the whole problem: a single-pass union-find over a
    // collected edge list (≤ ~16 MB of longs — a bounded, size-GUARDED
    // collect, unlike a corpus collect) is strictly faster. Dup-pair edge
    // sets are usually this small even for huge corpora; the distributed
    // star path remains the unbounded-scale route.
    if (sig._1 <= localThreshold) {
      val spark = edges.sparkSession
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x
        while (c != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      cur.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.putIfAbsent(a, a)
        parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val asg = parent.keySet().toArray(Array.empty[java.lang.Long])
        .map(n => (n.longValue(), find(n.longValue())))
      cur.unpersist()
      import spark.implicits._
      return asg.toSeq.toDF("id", "cluster_id")
    }
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      cur.unpersist()
      cur = next
      sig = nextSig
      round += 1
    }
    // Converged edge set is a forest of stars (node → component-min root):
    // every non-root node carries exactly one edge to its root; roots only
    // appear on the v side. min() is a safety net for the maxRounds cutoff.
    val nonRoots = cur.groupBy(col("u")).agg(min(col("v")).as("cluster_id"))
    val roots = cur.select(col("v").as("u"), col("v").as("cluster_id"))
    nonRoots.union(roots)
      .groupBy(col("u")).agg(min(col("cluster_id")).as("cluster_id"))
      .select(col("u").as("id"), col("cluster_id"))
  }

  /** Large-star: every node points its larger neighbors at the minimum of
    * its neighborhood (including itself). Edges emitted as (node, target). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: orient edges large→small, point every smaller neighbor
    * (and the node itself) at the minimum neighbor. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
                       least(col("u"), col("v")).as("v"))
    val mins = dir.groupBy("u").agg(min("v").as("m"))
    dir.join(mins, "u")
      .select(when(col("v") === col("m"), col("u")).otherwise(col("v")).as("n"),
              col("m"))
      .where(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Order-insensitive convergence signature: one aggregate row per round
    * (count, xor of row hashes, decimal sum of row hashes) — the only
    * driver-side state. bit_xor/decimal-sum cannot overflow under ANSI
    * arithmetic regardless of edge count. */
  private def signature(e: DataFrame): (Long, Long, String) = {
    val r: Row = e.agg(
      count(lit(1)),
      bit_xor(xxhash64(col("u"), col("v"))),
      sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
    if (r.isNullAt(1)) (0L, 0L, "")
    else (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString)
  }

  /** Every document → (id, cluster_id, is_representative): transitive
    * closure of the pairwise dup edges, min-id representative, singletons
    * are their own cluster. The cluster map is bounded by the number of
    * documents that appear in at least one dup pair — typically a small
    * fraction of the corpus, so AQE turns the join back into a broadcast. */
  def assignClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                     aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
    docs.select(col(idCol))
      .join(cc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_representative", col("cluster_id") === col(idCol))
  }
}
