package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`):
  *
  *  - [[cosine]] / [[bruteTopK]] — exact baseline. The query vector is a
  *    scalar parameter (broadcast into the plan as a literal array), so
  *    top-k is one scan + TakeOrdered: no shuffle of the corpus.
  *  - [[brutePairs]] — exact all-pairs above a threshold (for modest corpus
  *    sizes / verification).
  *  - [[lshBuckets]] / [[annTopK]] — the scale path: random-hyperplane LSH
  *    signs bucket the corpus; a query probes only its bucket (and
  *    neighbors by multi-table), turning 100 TB brute force into a few
  *    bucket scans. Hyperplanes are generated from a fixed seed — stable
  *    across runs and executors.
  */
object EmbeddingOps {

  /** array<float> → array<double> (math in double for stability). */
  def toDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k nearest by cosine to `query`. */
  def bruteTopK(df: DataFrame, idCol: String, vecCol: String,
                query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol),
        cosine(toDouble(col(vecCol)), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Exact pairs (a < b) with cosine ≥ threshold. Normalizes once, then a
    * single self-join; fine up to ~10⁴ vectors per executor-broadcast side —
    * beyond that use [[lshBuckets]] + within-bucket pairs. */
  def brutePairs(df: DataFrame, idCol: String, vecCol: String,
                 threshold: Double): DataFrame = {
    // dot/(‖a‖·‖b‖) with norms precomputed per row — same arithmetic shape
    // as reference cosine implementations, one O(d) pass per pair
    val prepped = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val a = prepped.alias("a"); val b = prepped.alias("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * hash-derived value in [-1, 1). */
  private def hyperplanes(dim: Int, planes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Sign-bucket id: bit p = (v · plane_p) ≥ 0. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 dim: Int, planes: Int = 12, seed: Long = 42L): DataFrame = {
    val hps = hyperplanes(dim, planes, seed)
    val v = toDouble(col(vecCol))
    val bucket = hps.zipWithIndex.map { case (hp, i) =>
      val h = array(hp.map(lit): _*)
      when(dot(v, h) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"), bucket.as("bucket"))
  }

  /** Approximate top-k: probe only the query's LSH bucket (single-table;
    * recall grows with fewer planes / multi-probe — measured in tests). */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              query: Seq[Double], k: Int, planes: Int = 8, seed: Long = 42L): DataFrame = {
    val hps = hyperplanes(dim, planes, seed)
    val qBucket = hps.zipWithIndex.map { case (hp, i) =>
      if (hp.zip(query).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
    }.sum
    val bucketed = lshBuckets(df, idCol, vecCol, dim, planes, seed)
    val q = array(query.map(lit): _*)
    bucketed.filter(col("bucket") === qBucket)
      .select(col("id"), cosine(toDouble(col("vec")), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
