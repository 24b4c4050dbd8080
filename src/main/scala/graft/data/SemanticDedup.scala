package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al., 2023: cluster the
  * embedding space with k-means, then drop near-identical pairs WITHIN each
  * cluster) — the embedding-space analog of MinHash dedup, catching
  * paraphrase-level duplicates that share no n-grams.
  *
  * Scale shape: k-means assignment is a broadcast of k centroids against a
  * map-only corpus scan (no corpus shuffle); the centroid update is one
  * keyed aggregation whose map-side combine reduces each partition to at
  * most k×dims partial sums. The pair scan is confined to clusters — cost
  * Σ|cluster|² instead of n² — so k is chosen to bound cluster size (the
  * paper uses k ≈ n/10⁴ at web scale; clusters then fit comfortably in one
  * task's hash join).
  *
  * DETERMINISM: Spark's double `sum` is partition-order-dependent in the
  * last ulp, which would make centroids — and therefore cluster membership
  * and the dedup verdict — drift between runs of the same job. A training
  * pipeline must be re-runnable bit-identically, so centroids accumulate as
  * EXACT integers: embeddings are quantized to fixed-point longs
  * (`trunc(v·4096)` — trunc, not round: it is the same well-defined
  * function of the double everywhere, with no half-way formula to disagree
  * on), summed exactly (associative), and only divided back to double at
  * distance time in a fixed ascending-dimension fold. Every arithmetic
  * step is order-pinned, so any two runs — and the SQL oracle — agree on
  * every bit. Quantization costs ~2⁻¹² relative centroid precision, far
  * below any meaningful cluster-boundary scale.
  */
object SemanticDedup {

  private val Scale = 4096.0

  /** Fixed-point quantization of a float embedding. */
  private val quantizeUdf = udf { v: scala.collection.Seq[Float] =>
    v.map(x => (x.toDouble * Scale).toLong).toArray
  }

  /** Squared L2 distance between a quantized vector and an exact-rational
    * centroid (sums s over count n), accumulated in ascending dimension
    * order — the order the SQL oracle replays. */
  private val distUdf = udf {
    (q: scala.collection.Seq[Long], s: scala.collection.Seq[Long], n: Long) =>
      val nD = n.toDouble
      var d = 0.0
      var i = 0
      while (i < q.length) {
        val diff = q(i) - s(i).toDouble / nD
        d += diff * diff
        i += 1
      }
      d
  }

  /** (id, q) quantized frame from (idCol, vecCol). */
  private def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), quantizeUdf(col(vecCol)).as("q"))

  /** One Lloyd assignment pass: nearest centroid, ties to the smallest
    * cluster id. Centroids (k rows) broadcast; corpus map-only. */
  private def assign(qv: DataFrame, centroids: DataFrame): DataFrame =
    qv.crossJoin(broadcast(centroids))
      .withColumn("dist", distUdf(col("q"), col("s"), col("n")))
      .groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cl"), col("q"))).as("m"))
      .select(col("id"), col("m.cl").as("cl"), col("m.q").as("q"))

  /** Exact integer centroid update; clusters that lost every member keep
    * their previous centroid (same rational, bit-same doubles next pass). */
  private def update(assigned: DataFrame, prev: DataFrame): DataFrame = {
    val sums = assigned
      .select(col("cl"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cl"), col("pos")).agg(sum(col("v")).as("sv"))
      .groupBy(col("cl"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sv")))),
        e => e.getField("sv")).as("s_new"))
    val counts = assigned.groupBy(col("cl")).agg(count(lit(1)).as("n_new"))
    prev.select(col("cl"), col("s").as("s_prev"), col("n").as("n_prev"))
      .join(sums, Seq("cl"), "left")
      .join(counts, Seq("cl"), "left")
      .select(col("cl"),
        coalesce(col("s_new"), col("s_prev")).as("s"),
        coalesce(col("n_new"), col("n_prev")).as("n"))
  }

  /** Deterministic k-means cluster assignment: init = the k smallest ids'
    * own vectors, `iters` full Lloyd rounds, then a final assignment.
    * Returns (id, cl). */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame = {
    val qv = quantized(df, idCol, vecCol)
    // init: the k smallest ids as singleton centroids (deterministic, no RNG)
    var centroids = qv.orderBy(col("id")).limit(k)
      .select(col("id").as("cl"), col("q").as("s"), lit(1L).as("n"))
    var i = 0
    while (i < iters) {
      centroids = update(assign(qv, centroids), centroids)
        .localCheckpoint() // k rows; cuts the exponential lineage of the loop
      i += 1
    }
    assign(qv, centroids).select(col("id"), col("cl"))
  }

  /** Full SemDeDup: cluster, then within each cluster drop any vector that
    * has a smaller-id neighbor at cosine ≥ `threshold` (exact cosine on the
    * original vectors — the quantization only steers the partition).
    * Returns one row per vector: (id, cluster_id, kept). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, threshold: Double): DataFrame = {
    // checkpointed: `assigned` feeds both self-join sides AND the final
    // kept-join — under lazy lineage each consumer re-ran every Lloyd
    // round (the quantize + assign scans) from scratch
    val assigned = kmeansAssign(df, idCol, vecCol, k, iters)
      .localCheckpoint()
    val vecs = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val withVec = assigned.join(vecs, "id")
    val a = withVec.alias("a"); val b = withVec.alias("b")
    val dropped = a.join(b,
        col("a.cl") === col("b.cl") && col("a.id") > col("b.id") &&
          graft.exprs.NativeExpressions.cosineSim(col("a.v"), col("b.v")) >= threshold)
      .select(col("a.id").as("id")).distinct()
    assigned
      .join(dropped.withColumn("hit", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cl").as("cluster_id"), col("hit").isNull.as("kept"))
  }
}
