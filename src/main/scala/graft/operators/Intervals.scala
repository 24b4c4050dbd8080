package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands: merge overlapping (or touching) intervals per key into
  * maximal disjoint "islands" — the classic availability/coverage operator
  * (user presence spans, sensor uptime, ad-exposure windows). The reference
  * has no interval algebra; its users sessionize in ClickHouse SQL after the
  * sink. Here it is a first-class operator.
  *
  * Algorithm (one pass over each key's sorted intervals): an interval starts
  * a new island iff its start exceeds the running maximum end of everything
  * before it; the island id is the running count of such starts. Both are
  * window functions over the SAME (key, ordered-by-start) frame, so the
  * whole operator is ONE shuffle by key; the final per-island aggregate
  * groups by (key, island) — a subdivision of the same key partitioning,
  * which AQE keeps local. Merged-island membership is a set property of the
  * interval endpoints (proof: running-max-end at a given start is
  * order-independent among equal starts), so the result is deterministic
  * under any tie order and any partitioning — safe at 100 TB.
  */
object Intervals {

  /** Merge intervals `[startCol, endCol]` (inclusive-touch: `start <=
    * running_max_end` joins the island) per `keyCols`. Output: key columns +
    * `island_start`, `island_end`, `n_intervals`. Endpoint columns must be
    * numeric (micros, millis — any total order). */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val ordered = Window.partitionBy(keys: _*)
      .orderBy(col(startCol), col(endCol))
    val prior = ordered.rowsBetween(Window.unboundedPreceding, -1)
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev_max_end", max(col(endCol)).over(prior))
      .withColumn("_new_island",
        when(col("_prev_max_end").isNull ||
          col(startCol) > col("_prev_max_end"), 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new_island")).over(running))
      .groupBy((keys :+ col("_island")): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("_island")
  }

  /** Total covered time per key (union length of the merged islands) —
    * derived from [[mergeIntervals]] in the same two stages. */
  def coverage(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String): DataFrame =
    mergeIntervals(df, keyCols, startCol, endCol)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("island_end") - col("island_start")).as("covered"),
        count(lit(1)).as("n_islands"))
}
