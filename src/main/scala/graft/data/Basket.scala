package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: frequent item PAIRS across baskets (orders,
  * sessions, documents) — the first A-priori level, and the building block
  * for "frequently bought together" and co-occurrence embeddings.
  *
  * Scale shape (A-priori pruning, Agrawal & Srikant VLDB'94): an item pair
  * can only reach support `s` if BOTH items individually appear in ≥ s
  * baskets, so frequent singletons are computed first (one partial-agg'd
  * groupBy) and the basket rows are semi-joined against them BEFORE the
  * quadratic within-basket pair expansion. On skewed real data that filter
  * is what keeps the pair generation finite: the pair join only ever sees
  * items that could possibly matter. The singleton set is a count-filtered
  * aggregate — orders of magnitude smaller than the item table — and ships
  * as a broadcast, so the only shuffle of basket rows is the final pair
  * count's partial-agg'd exchange (one row per surviving pair).
  */
object Basket {

  /** Frequent pairs with support ≥ `minSupport` baskets. Input: one row per
    * (basket, item) — duplicates are collapsed first so support counts
    * baskets, not occurrences. Output: `item_a < item_b`, `support`. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame =
    frequentPairsFrom(basketSets(df, basketCol, itemCol), minSupport)

  /** One partial-agg'd shuffle builds the per-basket item SET (map-side
    * collect_set dedups in place); singletons, the prune and the pair
    * explosion all derive from it without ever self-joining the item
    * table — pair fan-out is quadratic per basket (bounded), generated
    * scan-locally after the in-basket prune. Checkpointed because every
    * derivation below reads it more than once — under lazy lineage the
    * basket aggregate re-ran per consumer. */
  private[data] def basketSets(df: DataFrame, basketCol: String,
      itemCol: String): DataFrame = df
    .select(col(basketCol).as("basket"), col(itemCol).as("item"))
    .groupBy(col("basket"))
    .agg(sort_array(collect_set(col("item"))).as("its"))
    .localCheckpoint()

  private[data] def frequentPairsFrom(baskets: DataFrame,
      minSupport: Long): DataFrame = {
    val frequent = baskets.select(explode(col("its")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .select(col("item"))
    val pruned = baskets
      .select(col("basket"), explode(col("its")).as("item"))
      .join(broadcast(frequent), "item")
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("its"))
    pruned
      .select(posexplode(col("its")).as(Seq("i", "item_a")), col("its"))
      .select(col("item_a"),
        explode(expr("slice(its, i + 2, size(its))")).as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Item-item cosine similarity over basket co-occurrence — the classic
    * item-based collaborative-filtering neighborhood (Sarwar et al.,
    * WWW'01): treating each item as the binary vector of baskets it
    * appears in, cos(a,b) = cooc(a,b) / √(n(a)·n(b)). Emitted as
    * `sim2_micro = cooc² · 10⁶ / (n(a)·n(b))` — cosine SQUARED in
    * truncating integer micro-units, so the score is bit-deterministic
    * across engines (no float √, no summation-order sensitivity) while
    * ordering identically to cosine (x² is monotone on x ≥ 0). Top-`k`
    * neighbors per item, ties broken by partner id.
    *
    * Scale shape: pair generation inherits [[frequentPairs]]'s A-priori
    * prune (quadratic only within a basket, and only over frequent
    * items); singleton counts join the surviving PAIR aggregate — orders
    * of magnitude smaller than the basket rows — as a broadcast; the
    * top-k cut is the mergeable k-item heap aggregate
    * ([[graft.exprs.TopKBy]]), so the final shuffle carries ≤ k rows per
    * (item, map task), never a partition sort. */
  def cosineTopK(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, k: Int): DataFrame = {
    // ONE basket-set build feeds both the pair generation and the
    // singleton counts — the separate distinct+aggregate chain this
    // replaced re-scanned the raw item table a third time
    val baskets = basketSets(df, basketCol, itemCol)
    val pairs = frequentPairsFrom(baskets, minSupport)
    val counts = baskets
      .select(explode(col("its")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
    // Symmetrize so every item sees its full neighbor list, then score.
    val sym = pairs.select(col("item_a").as("item"), col("item_b").as("partner"),
        col("support"))
      .union(pairs.select(col("item_b"), col("item_a"), col("support")))
    val scored = sym
      .join(broadcast(counts.select(col("item"), col("n").as("n_i"))), Seq("item"))
      .join(broadcast(counts.select(col("item").as("partner"), col("n").as("n_p"))),
        Seq("partner"))
      .select(col("item"), col("partner"), col("support"),
        expr("support * support * 1000000 div (n_i * n_p)").as("sim2_micro"))
    val top = graft.exprs.TopKBy.topKBy(
      struct(col("sim2_micro"), (-col("partner")).as("neg")),
      struct(col("partner"), col("support"), col("sim2_micro")), k)
    scored.groupBy(col("item"))
      .agg(top.as("top"))
      .select(col("item"), posexplode(col("top")))
      .select(col("item"), col("col.partner").as("partner"),
        col("col.support").as("support"),
        col("col.sim2_micro").as("sim2_micro"),
        (col("pos") + 1).cast("long").as("rn"))
  }
}
