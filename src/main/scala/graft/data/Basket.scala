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
      minSupport: Long): DataFrame = {
    // One partial-agg'd shuffle builds the per-basket item SET (map-side
    // collect_set dedups in place); singletons, the prune and the pair
    // explosion all derive from it without ever self-joining the item
    // table — pair fan-out is quadratic per basket (bounded), generated
    // scan-locally after the in-basket prune.
    val baskets = df
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("its"))
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
}
