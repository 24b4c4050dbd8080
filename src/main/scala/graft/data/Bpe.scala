package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge learning (Sennrich et al., ACL 2016) — the
  * tokenizer-training step of an LLM data pipeline, distributed the way BPE
  * actually scales: the CORPUS is touched exactly once (word-frequency
  * aggregation, one shuffle), and every merge iteration runs over the
  * word-frequency DICT only — vocabulary-bounded work, independent of
  * corpus size. 100 TB of text with a 10M-word vocabulary trains merges
  * over 10M rows, not 100 TB.
  *
  * Per iteration: adjacent symbol pairs are exploded per dict word,
  * weighted by the word's corpus count, and summed (one partial-agg'd
  * shuffle over ≤ vocab × avg-word-len rows); the argmax pair — ties broken
  * (count desc, left asc, right asc) for determinism — is a 1-row driver
  * decision (inherently sequential: merge k+1 depends on k); the merge is
  * applied scan-locally with the classical greedy left-to-right fold.
  * Both the fold and the tie-break are engine-portable, so the whole
  * training loop unrolls into an exact SQL oracle.
  */
object Bpe {

  final case class LearnedMerge(step: Int, leftSym: String, rightSym: String,
                                pairCount: Long, nSymbolsAfter: Long)

  /** Corpus → word-frequency dict: lowercase `[a-z]+` tokens with corpus
    * counts ≥ `minCount`. The one pass that sees the full corpus. */
  def wordFreq(docs: DataFrame, textCol: String, minCount: Long = 3L): DataFrame =
    docs
      .select(explode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)

  /** Run `nMerges` BPE iterations over `dict(word, n)`. Returns the merge
    * table and the final per-word symbolization `(word, n, sym)`. */
  def learnMerges(dict: DataFrame, wordCol: String, nCol: String,
                  nMerges: Int): (Seq[LearnedMerge], DataFrame) = {
    val initial = dict.select(col(wordCol).as("word"), col(nCol).cast("long").as("n"),
        split(col(wordCol), "").as("sym"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var syms = initial
    // One driver action per merge step (the top-pair argmax — inherently
    // sequential: merge k+1 depends on k). The per-step vocabulary-size
    // probe is DEFERRED: each step's symbolization stays persisted and
    // all nMerges distinct-symbol counts run as ONE unioned aggregate
    // after the loop (r17: the loop paid 2 driver round-trips per step
    // where 1 is inherent; the counts are decisions' METADATA, nothing
    // downstream in the loop reads them).
    val stepFrames = Seq.newBuilder[(Int, DataFrame)]
    val decisions = Seq.newBuilder[(Int, String, String, Long)]
    (1 to nMerges).foreach { step =>
      val top = syms.filter(size(col("sym")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(sym)-1), " +
            "i -> struct(element_at(sym, i) AS l, element_at(sym, i+1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      require(top.nonEmpty, s"no adjacent pairs left at merge step $step")
      val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      syms = syms.withColumn("sym", mergeFold(a, b))
        .persist(StorageLevel.MEMORY_AND_DISK)
      stepFrames += (step -> syms)
      decisions += ((step, a, b, cnt))
    }
    val frames = stepFrames.result()
    val vocabAfter: Map[Int, Long] = frames
      .map { case (step, f) =>
        f.select(explode(col("sym")).as("s"))
          .agg(countDistinct(col("s")).as("c"))
          .select(lit(step).as("step"), col("c"))
      }
      .reduce(_ unionByName _)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // intermediate symbolizations are parents of the returned final frame;
    // with every step materialized by the counts action above, the lineage
    // no longer needs their cached blocks
    initial.unpersist()
    frames.dropRight(1).foreach(_._2.unpersist())
    val merges = decisions.result().map { case (step, a, b, cnt) =>
      LearnedMerge(step, a, b, cnt, vocabAfter(step))
    }
    (merges, syms)
  }

  /** Greedy left-to-right application of one merge `(a, b) → ab` over a
    * `sym` array column: after a merge the new symbol can open the next
    * match but never re-closes the one just consumed — the
    * fold-with-list-accumulator below IS that semantics (symbols are
    * [a-z]+ only, so inlining them into the lambda source is safe). */
  private def mergeFold(a: String, b: String): org.apache.spark.sql.Column = expr(
    s"aggregate(sym, cast(array() as array<string>), (acc, x) -> " +
      s"CASE WHEN size(acc) >= 1 AND element_at(acc, -1) = '$a' AND x = '$b' " +
      s"THEN concat(slice(acc, 1, size(acc) - 1), array('$a$b')) " +
      s"ELSE concat(acc, array(x)) END)")

  /** Tokenizer APPLY: run an ordered merge table over every word of
    * `words(wordCol)` and return `(word, n_sym)` — the post-BPE token
    * count per word. Unlike training, application is embarrassingly
    * parallel: each merge is one scan-local fold over the (distinct)
    * vocabulary frame, so encoding 100 TB of text costs the corpus word
    * explode plus a vocabulary-sized join — the corpus itself is never
    * folded per merge. */
  def applySymbolCounts(words: DataFrame, wordCol: String,
                        merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
        words.select(col(wordCol).as("word"), split(col(wordCol), "").as("sym"))) {
        case (df, (a, b)) => df.withColumn("sym", mergeFold(a, b))
      }
      .select(col("word"), size(col("sym")).cast("long").as("n_sym"))

  /** The merge table as a DataFrame (driver-built: `nMerges` rows of
    * training decisions, not data). */
  def mergeTable(spark: SparkSession, merges: Seq[LearnedMerge]): DataFrame = {
    import spark.implicits._
    merges.toDF("step", "left_sym", "right_sym", "pair_count", "n_symbols_after")
      .select(col("step").cast("long").as("step"), col("left_sym"), col("right_sym"),
        col("pair_count"), col("n_symbols_after"))
  }
}
