package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data curation.
  *
  * A 100-TB corpus is never trained on wholesale: pipelines carve out
  * mixture-weighted subsets, held-out splits, and per-source quotas. The
  * operators here are all HASH-deterministic — the same row lands in the
  * same sample/split on every run, every engine, and every scale, because
  * membership is a pure function of the row's key (md5, uniform over
  * [0, 2^128)), never of partitioning, row order, or an RNG seed. That is
  * the property `df.sample()` cannot give (it is seeded per-partition, so
  * a repartition reshuffles membership) and the reason replicated data
  * pipelines standardize on hash-bucket sampling.
  *
  * Everything is a scan-local projection/filter (no shuffle, no state):
  * at 100 TB each executor decides membership for its splits independently.
  * The quota variant adds the one shuffle its semantics require (a
  * per-stratum top-n).
  */
object Sampling {

  /** First 8 hex chars of md5(salt || key) — a uniform 32-bit draw as a
    * zero-padded hex string. Lexicographic comparison of lowercase hex
    * equals numeric comparison, so thresholds are plain string literals
    * and the same expression runs in any SQL engine. */
  def hashDraw(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast(StringType))), 1, 8)

  /** Hex threshold for a fraction: floor(f · 2^32) as 8 hex digits. */
  def thresholdHex(fraction: Double): String = {
    val f = math.min(math.max(fraction, 0.0), 1.0)
    "%08x".format(math.floor(f * 4294967296.0).toLong min 0xffffffffL)
  }

  /** Deterministic Bernoulli sample: keep rows whose 32-bit hash draw falls
    * below `fraction`. Membership is stable under repartition/rerun. */
  def bernoulli(df: DataFrame, keyCol: String, fraction: Double,
                salt: String = ""): DataFrame =
    df.filter(hashDraw(col(keyCol), salt) < lit(thresholdHex(fraction)))

  /** Disjoint train/validation/test assignment from one hash draw:
    * cumulative thresholds partition [0, 1), so every row gets exactly one
    * label and the splits are exhaustive and non-overlapping by
    * construction. `weights` maps label → fraction (must sum to ≤ 1; any
    * remainder falls into the last label). */
  def splitAssign(key: Column, weights: Seq[(String, Double)],
                  salt: String = ""): Column = {
    val draw = hashDraw(key, salt)
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val cases = weights.init.zip(cuts.init).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), cut)) =>
        val cond = draw < lit(thresholdHex(cut))
        Some(acc.fold(when(cond, lit(label)))(_.when(cond, lit(label))))
    }
    cases.fold(lit(weights.last._1))(_.otherwise(lit(weights.last._1)))
  }

  /** Per-stratum quota sample: the `quota` rows of each stratum with the
    * smallest hash draws — a deterministic "random" n-per-group. The
    * ordering ties break on the key itself, so the result is unique even
    * if two keys collide in the draw. Runs as a `bottom_k_by` aggregate
    * (per-stratum bounded heaps, partially combined map-side) rather than
    * a window `row_number`: the one shuffle keyed by stratum carries at
    * most quota rows per (stratum, map task) instead of the whole corpus,
    * and no stratum is ever sorted — a viral stratum costs its heap, not
    * a skewed partition sort. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyCol: String,
                      quota: Int, salt: String = ""): DataFrame = {
    val sortKey = struct(hashDraw(col(keyCol), salt).as("d"), col(keyCol).as("k"))
    df.groupBy(col(stratumCol))
      .agg(graft.exprs.TopKBy.bottomKBy(
        sortKey, struct(df.columns.map(col): _*), quota).as("__top"))
      .select(explode(col("__top")).as("__row"))
      .select(df.columns.map(c => col("__row").getField(c).as(c)): _*)
  }

  /** Global token-budget cut: order the corpus by a deterministic hash
    * draw and keep the prefix whose cumulative token count fits `budget` —
    * "give me a random 50B-token subset" as one reproducible operator.
    *
    * The global prefix sum never materializes a global sort: the shard IS
    * the first hex digit of the draw, so shard boundaries align with the
    * global hash order by construction. Per-shard window prefix sums run
    * in parallel (one shuffle on the shard key), the 16 shard totals take
    * an exclusive scan on the driver-side-tiny frame, and the offsets
    * broadcast back — the same two-phase scan layout as sequence packing.
    * Every row gets its exact global `token_offset`; `kept` marks the
    * prefix (the first row crossing the budget and everything after it is
    * cut — a clean boundary, not best-fit packing). */
  def tokenBudgetSample(df: DataFrame, keyCol: String, tokensCol: String,
                        budget: Long, salt: String = ""): DataFrame = {
    val withDraw = df
      .withColumn("__draw", md5(concat(lit(salt), col(keyCol).cast(StringType))))
      .withColumn("__shard", substring(col("__draw"), 1, 1))
    val inShard = Window.partitionBy(col("__shard"))
      .orderBy(col("__draw"), col(keyCol).cast(StringType))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withDraw.withColumn("__cum", sum(col(tokensCol)).over(inShard))
    val offsets = cum.groupBy(col("__shard")).agg(sum(col(tokensCol)).as("__total"))
      .withColumn("__offset", coalesce(sum(col("__total"))
        .over(Window.orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__shard"), col("__offset"))
    cum.join(broadcast(offsets), "__shard")
      .withColumn("token_offset", col("__offset") + col("__cum") - col(tokensCol))
      .withColumn("kept", col("__offset") + col("__cum") <= budget)
      .drop("__draw", "__shard", "__cum", "__offset")
  }

  /** Corpus-mix reweighting: per-row sampling weight that reshapes the
    * corpus's actual stratum distribution into a declared target mix
    * (the data-mixing step of every LLM dataset report: weight =
    * target_share / actual_share). Strata missing from `targetShares`
    * weigh 0. One tiny aggregate (|strata| rows) joined back broadcast —
    * the corpus itself is scanned once and never shuffled. Weights are
    * micro-ints (floor of 1e6·w) so results hash identically across
    * engines. */
  /** Temperature-scaled (α = 1/2) corpus rebalancing weights — the
    * multilingual-LM mixing rule (Lample & Conneau 2019 family): target
    * share ∝ n^α flattens the head languages without letting tail
    * languages dominate. Per stratum the keep probability is
    * `(targetShare/actualShare)` normalized so the most-upweighted
    * stratum keeps everything (downsample-only).
    *
    * α is FIXED at 1/2 because sqrt is the one power IEEE 754 requires
    * correctly rounded — `pow(n, 0.7)` is libm-dependent and can differ
    * by an ulp between engines, flipping a threshold-boundary document.
    * After flooring sqrt to milli units every later step is truncating
    * integer arithmetic: order-free sums, bit-identical across engines
    * and partitionings. Output: input columns + `keep_prob_micro`.
    *
    * Scale shape: one partial-agg'd stratum count (|strata| rows), all
    * weight math over that aggregate, weights broadcast back; the
    * Bernoulli keep decision is scan-local (see q_temperature_sample). */
  def temperatureWeights(df: DataFrame, stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__sm", expr("CAST(floor(sqrt(__n) * 1000) AS BIGINT)"))
    val tot = counts.agg(sum(col("__n")).as("__nn"), sum(col("__sm")).as("__ss"))
    val f = counts.crossJoin(broadcast(tot))
      .withColumn("__f_micro", expr(
        "(__sm * 1000000 div __ss) * 1000000 div (__n * 1000000 div __nn)"))
    val fn = f
      .withColumn("__maxf", max(col("__f_micro")).over(Window.partitionBy()))
      .select(col(stratumCol),
        expr("__f_micro * 1000000 div __maxf").as("keep_prob_micro"))
    df.join(broadcast(fn), Seq(stratumCol))
  }

  def mixWeights(df: DataFrame, stratumCol: String,
                 targetShares: Map[String, Double]): DataFrame = {
    val shares = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__share", col("__n") / sum(col("__n")).over(Window.partitionBy()))
    val target = typedLit(targetShares)
    val weighted = shares.select(col(stratumCol),
      floor(coalesce(element_at(target, col(stratumCol)), lit(0.0))
        / col("__share") * 1e6).cast(LongType).as("weight_micro"))
    df.join(broadcast(weighted), Seq(stratumCol))
  }

  /** EXACT-size-k deterministic uniform sample: rank rows by their 32-bit
    * hash draw (ties broken by key — a total order) and keep the first k.
    * The Bernoulli variants above give an expected fraction; this gives a
    * guaranteed count — what a fixed-budget eval set or human-annotation
    * batch needs.
    *
    * Scale shape (100 TB): `orderBy(draw).limit(k)` plans as TakeOrdered —
    * each partition keeps a local k-heap and only k rows per partition
    * reach the single merge, so there is no global sort and no full
    * shuffle; cost is one scan plus k·partitions rows of movement. The
    * draw is a pure function of the key, so re-runs and engines agree row
    * for row. */
  def exactKSample(df: DataFrame, keyCol: String, salt: String,
                   k: Int): DataFrame =
    df.withColumn("draw", hashDraw(col(keyCol), salt))
      .orderBy(col("draw"), col(keyCol))
      .limit(k)
}
