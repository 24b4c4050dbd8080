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
    val r = cfg.numHashes / cfg.bands
    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(cfg.bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * r + 1, lit(r)).cast(ArrayType(StringType)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
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

  /** Full pipeline: near-duplicate pairs (id_a < id_b, exact jaccard ≥
    * threshold), LSH-pruned then exactly verified.
    *
    * Scale shape: signatures are computed straight from text (fixed
    * ~numHashes·8 bytes per doc — the corpus's shingle sets, ~10× the text
    * size, are never materialized or shuffled); only candidate pairs join
    * back to the raw text for exact verification. */
  def duplicatePairs(df: DataFrame, idCol: String, textCol: String,
                     cfg: Config = Config()): DataFrame = {
    val sigFromText = udf { text: String =>
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
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val sigs = base.select(col("id"), sigFromText(col("text")).as("sig"))
    val cands = candidatePairs(sigs, cfg)
    cands
      .join(base.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", jaccardUdf(cfg.shingleSize)(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= cfg.threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup pairs, exactly verified: 64-bit token simhash banded
    * into `bands` contiguous chunks (pigeonhole: hamming ≤ bands−1 between
    * two hashes guarantees at least one identical chunk, so banded
    * candidate generation cannot miss a pair within `maxHamming` when
    * maxHamming ≤ bands−1); candidates within `maxHamming` then join back
    * to the raw text and are verified by exact shingle Jaccard ≥
    * `threshold` — same verified contract as [[duplicatePairs]], different
    * candidate machinery (simhash banding vs minhash banding).
    *
    * Defaults come from measurement on the synthetic corpus: planted
    * near-dup pairs (Jaccard ≥ 0.9) sit at simhash hamming ≤ 8, background
    * pairs (Jaccard < 0.5) far above, so maxHamming=10 / bands=11 catches
    * every true pair with 2 bits of margin while the exact verify step
    * discards any background candidate. Scale shape: the only shuffle is
    * the band-bucket groupBy; wider bands (fewer bits per bucket) raise
    * candidate volume as O(n²·bands/2^bits) — at 100 TB tighten maxHamming
    * (real near-dup corpora sit at hamming ≤ 3, where 4×16-bit bands make
    * collisions vanishingly rare). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 10, bands: Int = 11,
                   shingleSize: Int = 3, threshold: Double = 0.8): DataFrame = {
    require(maxHamming <= bands - 1,
      s"banding misses pairs: maxHamming=$maxHamming needs at least ${maxHamming + 1} bands")
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val hashed = base.select(col("id"),
      TextFunctions.simhash64(TextFunctions.tokens(col("text"))).as("sim"))
    // split the 64 bits into `bands` contiguous chunks, as evenly as possible
    val widths = {
      val w = 64 / bands; val extra = 64 % bands
      Seq.tabulate(bands)(i => if (i < extra) w + 1 else w)
    }
    val offsets = widths.scanLeft(0)(_ + _).init
    val chunkCols = widths.zip(offsets).map { case (w, off) =>
      shiftright(col("sim"), off).bitwiseAND(lit((1L << w) - 1))
    }
    val chunked = hashed.select(col("id"), col("sim"),
      posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "bucket")
    val a = chunked.alias("a"); val b = chunked.alias("b")
    val cands = a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        TextFunctions.hamming(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    cands
      .join(base.select(col("id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("jaccard", jaccardUdf(shingleSize)(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
