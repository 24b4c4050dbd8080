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

  /** Full pipeline: near-duplicate pairs (id_a < id_b, exact jaccard ≥
    * threshold), LSH-pruned then exactly verified. */
  def duplicatePairs(df: DataFrame, idCol: String, textCol: String,
                     cfg: Config = Config()): DataFrame = {
    val sh = withShingles(df, idCol, textCol, cfg.shingleSize).cache()
    val sigs = sh.select(col("id"), signatureUdf(cfg.numHashes)(col("shingles")).as("sig"))
    val cands = candidatePairs(sigs, cfg)
    val withSets = cands
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
    withSets
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= cfg.threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into 4×16-bit chunks
    * (hamming ≤ 3 guarantees one identical chunk — pigeonhole), verified by
    * exact hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      TextFunctions.simhash64(TextFunctions.tokens(col(textCol))).as("sim"))
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
  }
}
