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
    val items = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val frequent = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .select(col("item"))
    val pruned = items.join(broadcast(frequent), "item")
      .select(col("basket"), col("item"))
    pruned.as("a").join(pruned.as("b"),
        expr("a.basket = b.basket AND a.item < b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
