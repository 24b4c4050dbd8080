package graft.data

import org.apache.spark.sql.{Column, DataFrame, Encoders}
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
        graft.exprs.NativeExpressions.cosineSim(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Exact pairs (a < b) with cosine ≥ threshold — the verification
    * baseline, O(n²) by definition.
    *
    * Layout: the (id, vector) corpus is collected once, decoded to
    * primitive double arrays with precomputed norms, broadcast (torrent;
    * n × dim × 8 B — ~50 MB at 10⁵ × 64, the practical ceiling; beyond it
    * use [[lshBucketPairs]]), and the pair scan runs as a flatMap over
    * an index range: each task walks ascending partners with tight
    * primitive loops. Nothing heavy ever passes through UDF ARGUMENTS —
    * the previous chunked-broadcast-join converted each chunk's nested
    * float arrays per (row, chunk) call, which dominated wall time the
    * same way it did for the simhash sweep (measured there: 14–30×). */
  def brutePairs(df: DataFrame, idCol: String, vecCol: String,
                 threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast(LongType), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val n = rows.length
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      ids(i) = rows(i)._1
      val s = rows(i)._2
      val v = new Array[Double](s.length)
      var j = 0; var nn = 0.0
      while (j < v.length) { v(j) = s(j).toDouble; nn += v(j) * v(j); j += 1 }
      vecs(i) = v; norms(i) = math.sqrt(nn)
      i += 1
    }
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    spark.range(n.toLong).flatMap { k =>
      val (ids, vecs, norms) = bc.value
      val a = vecs(k.toInt); val na = norms(k.toInt); val idA = ids(k.toInt)
      val out = Seq.newBuilder[(Long, Long, Double)]
      var i = k.toInt + 1
      while (i < ids.length) {
        val b = vecs(i)
        var dot = 0.0; var j = 0
        while (j < a.length) { dot += a(j) * b(j); j += 1 }
        val c = dot / (na * norms(i))
        if (c >= threshold) out += ((idA, ids(i), c))
        i += 1
      }
      out.result()
    }.toDF("id_a", "id_b", "cosine")
      .withColumn("cosine", round(col("cosine"), 4))
  }

  /** LSH-bucketed near-duplicate PAIRS — the beyond-broadcast scale path
    * for [[brutePairs]]. Contract: every pair whose sign-LSH signatures
    * differ by ≤ 2·`probeHamming` bits is exact-cosine-verified (this is
    * EXACTLY the multi-probe "shares a probe bucket within `probeHamming`
    * flips" set, by the triangle inequality in both directions); pairs
    * further apart in signature space are never compared — the LSH recall
    * trade, measured vs [[brutePairs]] in tests. False positives never
    * survive the exact verify.
    *
    * Layout: one groupBy shuffle keyed by signature bucket. Each vector
    * lands once in its HOME bucket and, for every nonzero mask `m` with
    * popcount ≤ 2·probeHamming where `sig^m > sig`, once as a PROBE row in
    * bucket `sig^m`. Within a bucket group: home×home pairs (i<j) and
    * probe×home pairs — so each candidate pair is enumerated and verified
    * EXACTLY ONCE, in the bucket pair (min sig, max sig) it uniquely
    * determines. (The previous formulation verified each pair in every
    * shared probe bucket — up to |probe set| duplicate dot products — and
    * needed a distinct pass to clean up.) Cost: Σ over bucket pairs within
    * 2·probeHamming of |A|·|B| dots + the probe-row shuffle; at 100 TB
    * size `planes` so buckets hold ~10³–10⁴ vectors and the mask
    * neighborhood stays a small multiple of the corpus. */
  def lshBucketPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     threshold: Double, planes: Int = 8, probeHamming: Int = 1,
                     seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // checkpointed: the home rows and the probe expansion both read the
    // bucketed frame, and under lazy lineage each re-ran the signature
    // projection over every vector
    val bucketed = lshBuckets(df, idCol, vecCol, dim, planes, seed)
      .localCheckpoint()
    // nonzero masks with popcount ≤ 2·probeHamming (pair-distance form of
    // the probe radius); 0 is the home bucket, handled by the home row
    val masks = probeBuckets(0L, planes, 2 * probeHamming).filter(_ != 0L)
    val home = bucketed.select(col("id"), col("vec"), col("bucket"),
      lit(true).as("home"))
    val probes = bucketed.select(col("id"), col("vec"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("target"),
        col("bucket"))
      .filter(col("target") > col("bucket")) // pair owned by its larger-sig bucket
      .select(col("id"), col("vec"), col("target").as("bucket"), lit(false).as("home"))
    val verified = home.unionByName(probes)
      .groupByKey(_.getAs[Long]("bucket"))(Encoders.scalaLong)
      .flatMapGroups { (_: Long, rows: Iterator[org.apache.spark.sql.Row]) =>
        val buf = rows.toArray
        // decode once per bucket group; home members first
        val n = buf.length
        val ids = new Array[Long](n)
        val vecs = new Array[Array[Double]](n)
        val norms = new Array[Double](n)
        var nHome = 0
        var i = 0
        while (i < n) {
          if (buf(i).getAs[Boolean]("home")) {
            val t = buf(i); buf(i) = buf(nHome); buf(nHome) = t; nHome += 1
          }
          i += 1
        }
        i = 0
        while (i < n) {
          ids(i) = buf(i).getAs[Long]("id")
          val s = buf(i).getAs[scala.collection.Seq[Float]]("vec")
          val v = new Array[Double](s.length)
          var j = 0; var nn = 0.0
          while (j < v.length) { v(j) = s(j).toDouble; nn += v(j) * v(j); j += 1 }
          vecs(i) = v; norms(i) = math.sqrt(nn)
          i += 1
        }
        val out = Seq.newBuilder[(Long, Long, Double)]
        def verify(i: Int, k: Int): Unit = {
          val (a, b) = if (ids(i) < ids(k)) (i, k) else (k, i)
          var dot = 0.0; var j = 0
          val va = vecs(a); val vb = vecs(b)
          while (j < va.length) { dot += va(j) * vb(j); j += 1 }
          val c = dot / (norms(a) * norms(b))
          if (c >= threshold) out += ((ids(a), ids(b), c))
        }
        // home×home once (equal signatures), then probe×home (this bucket
        // is the pair's larger signature — unique owner)
        i = 0
        while (i < nHome) {
          var k = i + 1
          while (k < nHome) { verify(i, k); k += 1 }
          i += 1
        }
        i = nHome
        while (i < n) {
          var k = 0
          while (k < nHome) { verify(i, k); k += 1 }
          i += 1
        }
        out.result().iterator
      }
    verified.toDF("id_a", "id_b", "cosine")
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

  /** Nearest centroid by dot-product similarity (primitive loops). */
  private def nearest(vd: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestSim = Double.MinValue; var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var s = 0.0; var j = 0
      while (j < vd.length) { s += vd(j) * c(j); j += 1 }
      if (s > bestSim) { bestSim = s; best = i }
      i += 1
    }
    best
  }

  /** IVF (inverted-file) index: deterministic coarse centroids — a
    * hash-spread sample of the corpus (rows whose xxhash64(id) lands on a
    * stride of ~n/k; a seedless pseudo-random spread that needs no sort and
    * no bulk driver materialization — only k centroid vectors ever reach
    * the driver) refined by `lloydIterations` distributed k-means steps:
    * each partition accumulates per-centroid (sum, count) partials (k×dim
    * doubles per partition, tiny), the driver combines them into the new
    * means. Each vector is then assigned to its nearest centroid. The
    * returned frame is the "posting list" layout: repartitioning/clustering
    * by `centroid` colocates each cell, so a query only scans `nprobe`
    * cells instead of the corpus. */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String,
               numCentroids: Int, lloydIterations: Int = 2): (Seq[(Int, Array[Double])], DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val stride = math.max(1L, n / math.max(1, numCentroids))
    // orderBy(id).limit(k) over the ~k hash-selected survivors compiles to
    // TakeOrdered (per-partition top-k + driver merge of k rows), not a
    // full sort; determinism comes from the hash + the id order.
    var sample = df.select(col(idCol), col(vecCol))
      .filter(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
      .orderBy(col(idCol)).limit(numCentroids).collect()
    if (sample.length < numCentroids)
      // hash variance undersupplied (tiny corpus): top up with smallest ids
      sample = df.select(col(idCol), col(vecCol))
        .orderBy(col(idCol)).limit(numCentroids).collect()
    var centroidVecs: Array[Array[Double]] = sample
      .map(r => r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)

    val vecsOnly = df.select(col(vecCol)).as[Array[Float]]
    for (_ <- 0 until lloydIterations) {
      val bcIter = spark.sparkContext.broadcast(centroidVecs)
      val partials = vecsOnly.mapPartitions { rows =>
        val cs = bcIter.value
        val sums = Array.fill(cs.length)(null: Array[Double])
        val counts = new Array[Long](cs.length)
        rows.foreach { s =>
          val vd = new Array[Double](s.length)
          var j = 0
          while (j < vd.length) { vd(j) = s(j).toDouble; j += 1 }
          val c = nearest(vd, cs)
          if (sums(c) == null) sums(c) = new Array[Double](vd.length)
          var k = 0
          while (k < vd.length) { sums(c)(k) += vd(k); k += 1 }
          counts(c) += 1
        }
        sums.indices.iterator.filter(sums(_) != null)
          .map(i => (i, sums(i), counts(i)))
      }.collect()
      // per-iteration broadcast is consumed by the collect above — free the
      // executor copies instead of letting them pile up in a long session
      bcIter.destroy()
      val combined = partials.groupBy(_._1).map { case (c, ps) =>
        val sum = ps.map(_._2).reduce { (a, b) =>
          val out = a.clone(); var i = 0
          while (i < out.length) { out(i) += b(i); i += 1 }
          out
        }
        val count = ps.map(_._3).sum
        c -> sum.map(_ / count)
      }
      // empty clusters keep their previous centroid
      centroidVecs = centroidVecs.indices
        .map(i => combined.getOrElse(i, centroidVecs(i))).toArray
    }

    val centroids = centroidVecs.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    val bc = spark.sparkContext.broadcast(centroidVecs)
    val assign = udf { v: scala.collection.Seq[Float] =>
      val vd = v.map(_.toDouble).toArray
      nearest(vd, bc.value)
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
      .select(col("id"), graft.exprs.NativeExpressions.cosineSim(col("vec"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** All bucket ids within `maxHam` bit flips of `qBucket` (over `planes`
    * signature bits) — the multi-probe set. */
  private def probeBuckets(qBucket: Long, planes: Int, maxHam: Int): Seq[Long] = {
    def flips(bits: List[Int], remaining: Int): Seq[Long] =
      if (remaining == 0) Seq(0L)
      else bits match {
        case Nil => Seq(0L)
        case b :: rest =>
          flips(rest, remaining) ++ flips(rest, remaining - 1).map(_ | (1L << b))
      }
    flips((0 until planes).toList, maxHam).distinct.map(_ ^ qBucket)
  }

  /** Multi-probe LSH radius search: return every vector with exact cosine ≥
    * `minCosine` to `query`, scanning only the buckets within `probeHamming`
    * bit flips of the query's signature. Candidates are exact-verified, so
    * the result has no false positives; recall is 1.0 whenever every true
    * neighbor's signature is within the probe radius (measured per dataset —
    * the driver's oracle checks exactly this). The probe set is a literal
    * bucket-id list (`isInCollection`), so a corpus stored partitioned or
    * bucketed by `bucket` prunes to the probed cells instead of scanning —
    * at 100 TB the probe fraction is sum(C(planes,0..h))/2^planes of the
    * corpus (36% at 8 planes/h=3; tighter radii or more planes shrink it —
    * this synthetic corpus's "near" pairs sit at cosine ~0.5, i.e. ~60°
    * apart, which forces a wide radius; real near-dup corpora at cosine
    * ≥0.9 probe a few dozen buckets of millions). */
  def lshRadius(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                query: Seq[Double], minCosine: Double, planes: Int = 8,
                probeHamming: Int = 3, seed: Long = 42L): DataFrame = {
    val hps = hyperplanes(dim, planes, seed)
    val qBucket = hps.zipWithIndex.map { case (hp, i) =>
      if (hp.zip(query).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
    }.sum
    val probes = probeBuckets(qBucket, planes, probeHamming)
    val q = array(query.map(lit): _*)
    lshBuckets(df, idCol, vecCol, dim, planes, seed)
      .filter(col("bucket").isInCollection(probes))
      .select(col("id"), graft.exprs.NativeExpressions.cosineSim(col("vec"), q).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** IVF radius search: scan the `nprobe` nearest cells, return every
    * vector with exact cosine ≥ `minCosine` to the query. Same
    * exact-verified contract as [[lshRadius]]: no false positives ever;
    * recall is 1.0 whenever every true neighbor lives in a probed cell. */
  def ivfRadius(index: (Seq[(Int, Array[Double])], DataFrame),
                query: Seq[Double], minCosine: Double, nprobe: Int): DataFrame = {
    val (centroids, assigned) = index
    val probeCells = centroids
      .map { case (i, c) => (i, c.zip(query).map { case (a, b) => a * b }.sum) }
      .sortBy(-_._2).take(nprobe).map(_._1)
    val q = array(query.map(lit): _*)
    assigned.filter(col("centroid").isInCollection(probeCells))
      .select(col("id"), graft.exprs.NativeExpressions.cosineSim(col("vec"), q).as("cosine"))
      .filter(col("cosine") >= minCosine)
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
      .select(col("id"), graft.exprs.NativeExpressions.cosineSim(col("vec"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** k-NN label transfer: predict every vector's label from the majority
    * vote of its k nearest neighbors (self excluded) — the standard
    * embedding-space label-propagation / quality-classifier primitive for
    * corpus curation (label a few seeds, transfer to the rest).
    *
    * Determinism contract: similarity is an INTEGER dot product over
    * per-element fixed-point quantization `trunc(x · 10⁶)` (float32 →
    * double is exact, trunc matches on every engine), so neighbor ranking
    * — ordered by (dot desc, id asc) — and the majority vote — ordered by
    * (votes desc, label asc) — involve no float boundary anywhere and an
    * exhaustive SQL oracle can replay the whole contract bit-for-bit.
    *
    * Scale shape (100 TB): the corpus is broadcast once as primitive
    * arrays (dim·8 bytes per vector — ~1 GB per 2M vectors at dim 64) and
    * each partition scores its own queries in a tight integer loop: one
    * scan, no pair shuffle, no driver loop at score time. The BINDING
    * ceiling is the DRIVER: the broadcast is assembled via collect(), so
    * the whole corpus (plus its boxed Row form, transiently ~2×)
    * must fit in driver heap before the executor-side ~1 GB/2M-vector
    * broadcast figure is ever reached — size driver memory accordingly,
    * and past either limit the same contract runs on
    * [[ivfTopK]]/[[lshRadius]] candidates with integer re-ranking — the
    * classify step is unchanged. */
  def knnClassify(df: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast(LongType), col(vecCol),
        col(labelCol).cast(IntegerType))
      .as[(Long, Array[Float], Int)].collect().sortBy(_._1)
    val n = rows.length
    val ids = new Array[Long](n)
    val labels = new Array[Int](n)
    val qvecs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      ids(i) = rows(i)._1
      labels(i) = rows(i)._3
      val s = rows(i)._2
      val q = new Array[Long](s.length)
      var j = 0
      while (j < q.length) { q(j) = (s(j).toDouble * 1e6).toLong; j += 1 }
      qvecs(i) = q
      i += 1
    }
    val bc = spark.sparkContext.broadcast((ids, labels, qvecs))
    spark.range(n.toLong).map { qi =>
      val (ids, labels, qvecs) = bc.value
      val me = qi.toInt
      val a = qvecs(me)
      // top-k by (dot desc, id asc): insertion into a k-slot array —
      // k is small, the corpus scan dominates.
      val topDot = new Array[Long](k)
      val topIdx = new Array[Int](k)
      var filled = 0
      var c = 0
      while (c < ids.length) {
        if (c != me) {
          val b = qvecs(c)
          var dot = 0L; var j = 0
          while (j < a.length) { dot += a(j) * b(j); j += 1 }
          // better than the current worst slot?
          if (filled < k || dot > topDot(filled - 1) ||
              (dot == topDot(filled - 1) && ids(c) < ids(topIdx(filled - 1)))) {
            var p = if (filled < k) filled else k - 1
            while (p > 0 && (topDot(p - 1) < dot ||
                (topDot(p - 1) == dot && ids(topIdx(p - 1)) > ids(c)))) {
              topDot(p) = topDot(p - 1); topIdx(p) = topIdx(p - 1); p -= 1
            }
            topDot(p) = dot; topIdx(p) = c
            if (filled < k) filled += 1
          }
        }
        c += 1
      }
      // majority vote by (votes desc, label asc)
      val votes = new java.util.TreeMap[Int, Int]()
      var v = 0
      while (v < filled) {
        val l = labels(topIdx(v))
        votes.merge(l, 1, (x, y) => x + y)
        v += 1
      }
      var (bestLabel, bestVotes) = (Int.MaxValue, -1)
      votes.forEach { (l, cnt) =>
        if (cnt > bestVotes) { bestLabel = l; bestVotes = cnt }
      }
      (ids(me), labels(me), bestLabel, bestVotes.toLong,
        labels(me) == bestLabel)
    }.toDF("vec_id", "label", "predicted", "n_votes", "correct")
  }
}
