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
    // Block nested loop done right: broadcast the corpus once (ids + raw
    // vectors, a few MB for 10⁴×64f), then each partition streams its rows
    // against the broadcast side with primitive-array loops — no 25M-row
    // join materialization, no per-pair allocation. Dot is ascending-index,
    // cosine is dot/(‖a‖·‖b‖): bit-identical to the declarative form.
    // Beyond ~10⁵ vectors use lshBuckets + within-bucket pairs instead.
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast(LongType), col(vecCol)).collect()
      .map { r =>
        val arr = r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray
        (r.getLong(0), arr)
      }.sortBy(_._1)
    def dotP(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = rows.map { case (_, v) => math.sqrt(dotP(v, v)) }
    val bc = spark.sparkContext.broadcast((rows, norms))
    import spark.implicits._
    val n = rows.length
    val out = spark.sparkContext.parallelize(0 until n,
        math.min(n, spark.sparkContext.defaultParallelism * 4))
      .flatMap { i =>
        val (vecs, nrm) = bc.value
        val (idA, va) = vecs(i)
        (i + 1 until vecs.length).iterator.flatMap { j =>
          val c = dotP(va, vecs(j)._2) / (nrm(i) * nrm(j))
          if (c >= threshold) Some((idA, vecs(j)._1, c)) else None
        }
      }
    out.toDF("id_a", "id_b", "cosine")
      .withColumn("cosine", round(col("cosine"), 4))
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

  /** IVF (inverted-file) index: deterministic coarse centroids (an evenly
    * spaced sample of the corpus — cheap, seedless, stable), each vector
    * assigned to its nearest centroid. The returned frame is the "posting
    * list" layout: repartitioning/clustering by `centroid` colocates each
    * cell, so a query only scans `nprobe` cells instead of the corpus. */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String,
               numCentroids: Int): (Seq[(Int, Array[Double])], DataFrame) = {
    val spark = df.sparkSession
    val all = df.select(col(idCol)).orderBy(col(idCol)).limit(1000000).collect().map(_.getLong(0))
    val step = math.max(1, all.length / numCentroids)
    val centroidIds = all.zipWithIndex.collect { case (id, i) if i % step == 0 => id }
      .take(numCentroids)
    val centroids = df.filter(col(idCol).isInCollection(centroidIds))
      .select(col(idCol), col(vecCol)).collect()
      .map(r => r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)
      .zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    val bc = spark.sparkContext.broadcast(centroids)
    val assign = udf { v: scala.collection.Seq[Float] =>
      val vd = v.map(_.toDouble).toArray
      var best = 0; var bestSim = Double.MinValue
      bc.value.foreach { case (i, c) =>
        var s = 0.0; var j = 0
        while (j < vd.length) { s += vd(j) * c(j); j += 1 }
        if (s > bestSim) { bestSim = s; best = i }
      }
      best
    }
    (centroids, df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      assign(col(vecCol)).as("centroid")))
  }

  /** IVF approximate top-k: rank centroids by similarity to the query,
    * scan only the nprobe nearest cells. */
  def ivfTopK(index: (Seq[(Int, Array[Double])], DataFrame),
              query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val (centroids, assigned) = index
    val probeCells = centroids
      .map { case (i, c) => (i, c.zip(query).map { case (a, b) => a * b }.sum) }
      .sortBy(-_._2).take(nprobe).map(_._1)
    val q = array(query.map(lit): _*)
    assigned.filter(col("centroid").isInCollection(probeCells))
      .select(col("id"), cosine(toDouble(col("vec")), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
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
