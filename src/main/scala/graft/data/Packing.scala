package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Sequence packing: lay a corpus out as fixed-length training sequences.
  *
  * LLM training consumes fixed-length token sequences, not documents; the
  * standard preprocessing step ("concat-and-chunk") concatenates documents
  * in a deterministic shuffled order and slices the token stream every
  * `seqLen` tokens, letting documents straddle chunk boundaries. This
  * operator computes that layout as a PLAN — for every document, its token
  * offset in the stream and the range of sequence indices it lands in —
  * without materializing tokens, so the writer stage can emit each packed
  * sequence from exactly the documents that overlap it.
  *
  * Determinism and scale come from the same two choices as [[Sampling]]:
  * the order is a pure hash draw (md5 — stable across runs, engines, and
  * partitionings, and doubles as the training shuffle), and the stream is
  * SHARDED (shard = id mod nShards): each shard is an independent token
  * stream packed in parallel, which is how production packers parallelize —
  * a single global stream would serialize the prefix sum through one
  * partition. Within a shard the prefix sum is one window aggregate: one
  * shuffle, per-shard sort, no state, no collect. At 100 TB, pick nShards
  * so a shard's rows fit a task sort (e.g. 10⁴–10⁵ shards); the layout
  * stays reproducible at any nShards because the shard assignment is part
  * of the contract, not an execution detail.
  *
  * Beyond-reference tier: the reference engine stops at delivering events
  * (`glassflow-api/internal/sink/clickhouse.go`); training-data preparation
  * needs the corpus→sequences step too.
  */
object Packing {

  /** Packing plan: (idCol, shard, n_tokens, tok_start, seq_first, seq_last)
    * for every document with at least one token. `tok_start` is the
    * document's exclusive prefix offset in its shard's token stream under
    * the hash-draw order; the document occupies sequences
    * `seq_first = tok_start / seqLen` through `seq_last = (tok_start +
    * n_tokens - 1) / seqLen` of that shard (straddling = spans > 1). */
  def packPlan(df: DataFrame, idCol: String, tokensCol: Column,
               seqLen: Int, nShards: Int, salt: String = "pack"): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    val d = df.select(col(idCol), (col(idCol) % nShards).as("shard"),
        tokensCol.cast(LongType).as("n_tokens"),
        Sampling.hashDraw(col(idCol), salt).as("__draw"))
      .filter(col("n_tokens") > 0)
    val stream = Window.partitionBy(col("shard"))
      .orderBy(col("__draw"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("__cum", sum(col("n_tokens")).over(stream))
      .withColumn("tok_start", col("__cum") - col("n_tokens"))
      // integral `div`, not double division: exact at any stream length
      .select(col(idCol), col("shard"), col("n_tokens"), col("tok_start"),
        expr(s"tok_start div $seqLen").as("seq_first"),
        expr(s"(__cum - 1) div $seqLen").as("seq_last"))
  }

  /** Per-shard packing summary: sequence count and tail waste — the unfilled
    * tail of each shard's last sequence, the only padding concat-and-chunk
    * produces. |shards| rows. */
  def packStats(plan: DataFrame, seqLen: Int): DataFrame =
    plan.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
        (max(col("seq_last")) + 1).as("n_sequences"))
      .withColumn("tail_pad_tokens",
        col("n_sequences") * seqLen - col("total_tokens"))
}
