package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash + LSH near-duplicate detection — the standard scale path for
  * fuzzy dedup over a large corpus: shingle → k minhashes → band →
  * bucket-join candidates → exact-Jaccard verify.
  *
  * Scale shape: the only shuffle is the band-bucket groupBy; candidate
  * verification joins shingle sets back by id. All-pairs comparison never
  * happens — cost is O(docs × k) hashing plus O(candidates) verification.
  * With numHashes=128 / bands=32 (r=4), P(miss) for a true pair at
  * Jaccard 0.8 is (1−0.8⁴)³²≈5e-8 — effectively exhaustive, while pairs at
  * background similarity (~0.04 here) essentially never collide.
  */
object MinHashDedup {

  final case class Config(
    shingleSize: Int = 3,
    numHashes: Int = 128,
    bands: Int = 32,
    threshold: Double = 0.8)

  /** doc frame (id, text) → (id, shingles array<string>). */
  def withShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      TextFunctions.shingles(col(textCol), n).as("shingles"))

  /** MinHash signature: one base FNV-1a 64 hash per shingle, then the k
    * per-seed values derived with a splitmix64 stream — a tight primitive
    * loop (k=128 seeded string re-hashes per shingle, the naive form, was
    * the dominant cost; and Catalyst cannot hoist a shared subexpression
    * out of higher-order-function lambdas, so this lives in a UDF). */
  def signatureUdf(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { shingles: scala.collection.Seq[String] =>
      val out = new Array[Long](numHashes)
      java.util.Arrays.fill(out, Long.MaxValue)
      shingles.foreach { t =>
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
        var s = 0
        while (s < numHashes) {
          var z = h + s * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^= z >>> 31
          if (z < out(s)) out(s) = z
          s += 1
        }
      }
      out.toSeq
    }

  /** Candidate pairs (a < b) that share at least one LSH band bucket. */
  def candidatePairs(sigs: DataFrame, cfg: Config): DataFrame = {
    val banded = bandBuckets(sigs, cfg)
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b)))

  /** Distinct word n-gram shingle set (JVM-side; same definition as
    * [[TextFunctions.shingles]]: whitespace tokens of trimmed text). */
  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = if (text == null || text.trim.isEmpty) Array.empty[String]
    else text.trim.split("\\s+")
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Exact Jaccard from raw texts (used to verify candidate pairs — only
    * O(candidates) texts are ever re-shingled). */
  private def jaccardUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: String, b: String) =>
      val (sa, sb) = (shingleSet(a, n), shingleSet(b, n))
      val union = sa.size + sb.size - (sa & sb).size
      if (union == 0) 0.0 else (sa & sb).size.toDouble / union
    }

  /** MinHash signature straight from text (one UDF call: shingle + k
    * splitmix64 streams in a tight primitive loop). */
  private def sigFromTextUdf(cfg: Config): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { text: String =>
      val sh = shingleSet(text, cfg.shingleSize)
      val out = new Array[Long](cfg.numHashes)
      java.util.Arrays.fill(out, Long.MaxValue)
      sh.foreach { t =>
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
        var s = 0
        while (s < cfg.numHashes) {
          var z = h + s * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^= z >>> 31
          if (z < out(s)) out(s) = z
          s += 1
        }
      }
      out.toSeq
    }

  /** (id, band, bucket) rows — one per band per doc (the LSH index shape;
    * persisting this frame IS the incremental-dedup index). */
  private def bandBuckets(sigs: DataFrame, cfg: Config): DataFrame = {
    val r = cfg.numHashes / cfg.bands
    sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(cfg.bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * r + 1, lit(r)).cast(ArrayType(StringType)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** Full pipeline: near-duplicate pairs (id_a < id_b, exact jaccard ≥
    * threshold), LSH-pruned then exactly verified.
    *
    * Scale shape: signatures are computed straight from text (fixed
    * ~numHashes·8 bytes per doc — the corpus's shingle sets, ~10× the text
    * size, are never materialized or shuffled); only candidate pairs join
    * back to the raw text for exact verification. */
  def duplicatePairs(df: DataFrame, idCol: String, textCol: String,
                     cfg: Config = Config()): DataFrame = {
    // spread before the signature UDF (single-row-group scans plan one
    // task — guide §2.5) and checkpoint the (id, sig) proxy: the band
    // self-join inside candidatePairs reads it for both sides, which
    // under lazy lineage re-ran the MinHash signature UDF per side
    val base = Spread.byKey(
      df.select(col(idCol).as("id"), col(textCol).as("text")), col("id"))
    val sigs = base.select(col("id"), sigFromTextUdf(cfg)(col("text")).as("sig"))
      .localCheckpoint()
    val cands = candidatePairs(sigs, cfg)
    cands
      .join(base.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", jaccardUdf(cfg.shingleSize)(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= cfg.threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Incremental near-dup screening of a NEW batch against an EXISTING
    * corpus — the operation a continuously-ingesting 100 TB pipeline
    * actually runs: all-pairs dedup of the full corpus is a one-time
    * backfill; every arriving batch only needs batch×corpus candidates.
    *
    * Scale shape: the batch's band buckets are BROADCAST (a batch is small
    * by definition — per-doc index cost is bands×16 bytes), so the corpus
    * side is a map-only scan: signature → band → broadcast-hash probe, no
    * corpus shuffle anywhere. Only the LSH hits (corpus rows sharing a
    * band bucket with some batch doc) flow into the exact-Jaccard verify,
    * which re-reads just those texts. In production the corpus band index
    * ([[bandBuckets]] output) is persisted once and this becomes a probe
    * against a bucketed table.
    *
    * Returns one row per batch doc: `doc_id`, `is_new` (no corpus match at
    * `cfg.threshold`), and the minimum matching corpus id + its exact
    * Jaccard (null when new). Within-batch duplicates are screened by
    * [[duplicatePairs]] on the batch itself.
    */
  def dedupAgainstCorpus(corpus: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String,
                         cfg: Config = Config()): DataFrame = {
    val cBase = corpus.select(col(idCol).as("id"), col(textCol).as("text"))
    val bBase = batch.select(col(idCol).as("id"), col(textCol).as("text"))
    val cBands = bandBuckets(
      cBase.select(col("id"), sigFromTextUdf(cfg)(col("text")).as("sig")), cfg)
    val bBands = bandBuckets(
      bBase.select(col("id"), sigFromTextUdf(cfg)(col("text")).as("sig")), cfg)
    val cands = cBands.join(
        broadcast(bBands.select(col("band"), col("bucket"), col("id").as("batch_id"))),
        Seq("band", "bucket"))
      .select(col("batch_id"), col("id").as("corpus_id"))
      .distinct()
    val verified = cands
      .join(bBase.select(col("id").as("batch_id"), col("text").as("text_b")), "batch_id")
      .join(cBase.select(col("id").as("corpus_id"), col("text").as("text_c")), "corpus_id")
      .withColumn("jaccard", jaccardUdf(cfg.shingleSize)(col("text_b"), col("text_c")))
      .filter(col("jaccard") >= cfg.threshold)
      // deterministic representative: the smallest matching corpus id
      .groupBy(col("batch_id"))
      .agg(min(struct(col("corpus_id"), col("jaccard"))).as("m"))
      .select(col("batch_id"), col("m.corpus_id").as("match_id"),
        round(col("m.jaccard"), 4).as("jaccard"))
    bBase.select(col("id").as("doc_id"))
      .join(verified.withColumnRenamed("batch_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_id").isNull.as("is_new"),
        col("match_id"), col("jaccard"))
  }

  /** SimHash near-dup pairs, exactly verified: candidate pairs within
    * simhash hamming ≤ `maxHamming` are joined to precomputed shingle sets
    * and verified by exact Jaccard ≥ `threshold` — the verified contract of
    * [[duplicatePairs]] with simhash candidate machinery. The RADIUS is the
    * operator's recall contract (Manku et al., WWW'07): true near-dups
    * whose simhash distance exceeds it are missed by design — on short
    * documents token-simhash correlates loosely with shingle Jaccard
    * (measured here: planted Jaccard-0.9 pairs span hamming 0–13), so the
    * radius trades recall against candidate volume.
    *
    * Candidate generation adapts to the radius — both paths are exact
    * (no candidate within the radius is ever missed):
    *  - radius ≤ 3: the classic 4×16-bit multi-index (pigeonhole: one of
    *    four 16-bit bands must match exactly) — collisions are rare even
    *    on clustered corpora, scales to arbitrarily large n.
    *  - wider radius: a distributed all-pairs popcount sweep over the
    *    64-bit sketches (broadcast corpus, xor+popcount primitive loop,
    *    in-pass verification) — O(n²) with a ~1 ns/pair constant. Banding
    *    is provably useless here: on this corpus a hamming-10 guarantee
    *    (11 × 6-bit bands, or Manku compound band-pairs) surfaces 75–90%
    *    of ALL pairs as candidates (measured 9.4–11.3 M of 12.5 M at
    *    n=5000) because sketch bits are heavily correlated across
    *    same-template documents; the sweep touches exactly the true
    *    ≤-radius pairs (365 k). At n beyond ~10⁶ tighten the radius
    *    instead — that is simhash's real-world operating point.
    *
    * Verification joins each candidate to the docs' shingle arrays
    * (computed ONCE per doc, not re-shingled per pair) and evaluates
    * Jaccard natively — a candidate-count-bounded cost. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 10,
                   shingleSize: Int = 3, threshold: Double = 0.8): DataFrame = {
    if (maxHamming <= 3) {
      // few candidates (rare collisions): banded pairs, then an array join
      val base = df.select(col(idCol).cast(LongType).as("id"),
        TextFunctions.simhash64(TextFunctions.tokens(col(textCol))).as("sim"),
        array_distinct(TextFunctions.shingles(col(textCol), shingleSize)).as("sh"))
      val cands = bandedCandidates(base.select(col("id"), col("sim")), maxHamming)
      val sh = base.select(col("id"), col("sh"))
      cands
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    } else sweepPairs(df, idCol, textCol, maxHamming, shingleSize, threshold)
  }

  /** 4×16-bit multi-index candidates (exact for hamming ≤ 3). */
  private def bandedCandidates(hashed: DataFrame, maxHamming: Int): DataFrame = {
    val chunked = hashed.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "bucket")
    val a = chunked.alias("a"); val b = chunked.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        TextFunctions.hamming(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"))
  }

  /** Distributed all-pairs popcount sweep WITH in-pass verification.
    *
    * Layout: shingles are hashed to SORTED distinct 64-bit arrays in-plan
    * (codegen'd xxhash64 — a collision shifts one Jaccard by ~1/|union|
    * with probability ~10⁻¹², far below the 4-decimal rounding), the
    * (id, sketch, shingle-hash) corpus is torrent-broadcast ONCE
    * (~5 KB/doc → ~25 MB at n=5000; practical ceiling ~10⁵ docs / 500 MB,
    * beyond which tighten the radius to ≤ 3 and band), and a flatMap
    * scans each row against the id-sorted corpus from its own position:
    * a ~1 ns xor+popcount gate per pair, and only gated pairs (the true
    * ≤-radius set) pay a sorted-merge long intersection. No per-pair (or
    * per-call) array conversion anywhere — passing chunk payloads through
    * UDF arguments re-materializes them per row (measured 30×/14× slower
    * as a string-array join / chunked-arg UDF at n=5000). */
  private def sweepPairs(df: DataFrame, idCol: String, textCol: String,
                         maxHamming: Int, shingleSize: Int, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // distinct shingle hashes as a sorted long array, one primitive-loop
    // UDF call per doc (shingling via interpreted HOF lambdas costs
    // seconds at n=5000; FNV per shingle in a tight loop does not)
    val shhUdf = udf { text: String =>
      val set = new java.util.HashSet[Long]()
      val toks = if (text == null || text.trim.isEmpty) Array.empty[String]
      else text.trim.split("\\s+")
      var i = 0
      while (i + shingleSize <= toks.length) {
        var h = 0xcbf29ce484222325L
        var k = i
        while (k < i + shingleSize) {
          val t = toks(k)
          var c = 0
          while (c < t.length) { h ^= t.charAt(c); h *= 0x100000001b3L; c += 1 }
          if (k < i + shingleSize - 1) { h ^= ' '; h *= 0x100000001b3L }
          k += 1
        }
        set.add(h)
        i += 1
      }
      val arr = new Array[Long](set.size)
      val it = set.iterator(); var j = 0
      while (it.hasNext) { arr(j) = it.next(); j += 1 }
      java.util.Arrays.sort(arr)
      arr
    }
    val hashed = df.select(col(idCol).cast(LongType).as("id"),
      TextFunctions.simhash64(TextFunctions.tokens(col(textCol))).as("sim"),
      shhUdf(col(textCol)).as("shh"))
      .as[(Long, Long, Array[Long])]
    // ONE evaluation: the corpus is collected (bounded — see ceiling
    // above), broadcast, and the pair scan runs over an index range so the
    // document table is never scanned a second time
    val corpus = hashed.collect().sortBy(_._1)
    val bcIds = corpus.map(_._1); val bcSims = corpus.map(_._2); val bcShs = corpus.map(_._3)
    val bc = spark.sparkContext.broadcast((bcIds, bcSims, bcShs))
    // |A∩B| by sorted merge, abandoning as soon as `needed` becomes
    // unreachable (dissimilar pairs diverge early — most gated pairs are
    // background, so the early exit is the common path)
    def intersectAtLeast(a: Array[Long], b: Array[Long], needed: Int): Int = {
      var i = 0; var j = 0; var n = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
        val remaining = math.min(a.length - i, b.length - j)
        if (n + remaining < needed) return -1
      }
      n
    }
    spark.range(corpus.length).flatMap { k =>
      val (ids, sims, shs) = bc.value
      val idA = ids(k.toInt); val simA = sims(k.toInt); val shA = shs(k.toInt)
      var i = k.toInt + 1
      val out = Seq.newBuilder[(Long, Long, Double)]
      while (i < ids.length) {
        if (java.lang.Long.bitCount(simA ^ sims(i)) <= maxHamming) {
          val b = shs(i)
          // jaccard ≥ t needs |A∩B| ≥ t/(1+t)·(|A|+|B|); since the
          // intersection can't exceed the smaller set, wildly different
          // sizes can't clear the threshold — skip the merge entirely.
          // `needed` is lowered by 1 so float rounding can only make the
          // prune conservative; acceptance uses the exact division (the
          // same double arithmetic as the SQL oracle).
          val needed = math.max(1,
            math.ceil(threshold / (1 + threshold) * (shA.length + b.length)).toInt - 1)
          if (math.min(shA.length, b.length) >= needed) {
            val inter = intersectAtLeast(shA, b, needed)
            if (inter > 0) {
              val union = shA.length + b.length - inter
              val j = inter.toDouble / union
              if (j >= threshold) out += ((idA, ids(i), j))
            }
          }
        }
        i += 1
      }
      out.result()
    }.toDF("id_a", "id_b", "jaccard")
      .withColumn("jaccard", round(col("jaccard"), 4))
  }
}
