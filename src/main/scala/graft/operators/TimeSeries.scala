package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping operators a warehouse ETL layer needs around the
  * windowed aggregates: regular-grid resampling with gap fill, and
  * slowly-changing-dimension (type 2) snapshot construction.
  *
  * Both are one-shuffle shapes: every window/join partitions by the same
  * key column, so Catalyst plans a single hash exchange that the
  * downstream window sorts reuse. At 100 TB the key-grid explode is the
  * thing to watch — `gapFill` explodes one row per (key, bucket) in the
  * key's OWN observed span (never the global span), so a key active for
  * an hour costs one row, not a year of empty buckets.
  */
object TimeSeries {

  /** Resample per-key observations onto the complete integer bucket grid
    * `[min(bucket), max(bucket)]` of each key, then forward-fill values
    * across the introduced gaps.
    *
    * Input: one row per observed `(key, bucket)` with `valueCol` the
    * observation (`bucket` must be an integral column — epoch hours, days,
    * or any fixed-width index). Output columns: key, bucket, the original
    * value (null in gaps), `filled_<value>` (last observation carried
    * forward — integer-exact, no interpolation), and `is_gap`.
    *
    * Scale shape: the grid is built from the per-key (lo, hi) aggregate —
    * 16 bytes per key through the first shuffle — and `sequence()` explodes
    * grid rows scan-locally. The left join back to observations and the
    * forward-fill window both hash by key: one exchange, reused.
    */
  def gapFill(observed: DataFrame, keyCol: String, bucketCol: String,
              valueCol: String): DataFrame = {
    val bounds = observed.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(bucketCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(keyCol, bucketCol), "left")
      .withColumn(s"filled_$valueCol", last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(valueCol).isNull)
  }

  /** Collapse a per-key event stream into SCD type-2 validity intervals:
    * one row per run of unchanged attribute values, stamped
    * `[valid_from, valid_to)` with `valid_to` null on the current row and
    * `version` the 1-based change ordinal.
    *
    * `orderCols` is the total per-key order (pass a tiebreaker column —
    * e.g. the event id — after the timestamp so runs are deterministic
    * under equal timestamps). A row opens a new interval iff any
    * `attrCols` value differs (null-safe) from the previous row's.
    *
    * Scale shape: change detection and interval stamping are two window
    * passes over the same `partitionBy(key)` — one exchange. State per key
    * is the sort, not the history: no driver materialization, no
    * whole-history collect.
    */
  def scd2(events: DataFrame, keyCol: String, orderCols: Seq[String],
           attrCols: Seq[String]): DataFrame = {
    val ord = orderCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val marked = events
      .withColumn("__first", row_number().over(w) === 1)
      .withColumn("__chg", changed)
      .filter(col("__first") || col("__chg"))
    val wc = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    marked
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(wc))
      .withColumn("version", row_number().over(wc).cast("long"))
      .drop("__first", "__chg")
  }

  /** Integer exponential smoothing per key: `s₀ = x₀`, `sᵢ = sᵢ₋₁ +
    * (xᵢ − sᵢ₋₁) / 2^k` (truncating division toward zero — DuckDB's `//`
    * and Scala's `/` agree, so the recurrence is bit-deterministic across
    * engines where a float EWMA is not).
    *
    * The recurrence is inherently sequential per key, so this is a genuine
    * ordered-scan operator (the [[AsOfJoin.sortMerge]] shape, tier (d) of
    * the custom-operator ladder — built-in windows can't express a
    * self-referential running value): repartition by key, sort within
    * partitions by (key, ts), one linear pass holding O(1) state per key.
    * Keys are shared-nothing, so the pass parallelizes across partitions
    * and survives any scale-up; nothing is collected.
    *
    * Input columns must be (`keyCol`: long, `tsCol`: long, `valueCol`:
    * long); output appends `ewma`. Caller guarantees (key, ts) uniqueness
    * (true for the event streams here) — equal timestamps would make any
    * sequential smoothing order-ambiguous. */
  def ewmaInt(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 0 && k < 63, s"k must be in [0, 62]: $k")
    val div = 1L << k
    val inSchema = df.select(col(keyCol), col(tsCol), col(valueCol)).schema
    val outSchema = org.apache.spark.sql.types.StructType(
      inSchema.fields :+ org.apache.spark.sql.types.StructField(
        "ewma", org.apache.spark.sql.types.LongType, nullable = false))
    df.select(col(keyCol), col(tsCol), col(valueCol))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol))
      .mapPartitions { rows =>
        var curKey = 0L
        var haveKey = false
        var s = 0L
        rows.map { r =>
          val key = r.getLong(0)
          val x = r.getLong(2)
          if (!haveKey || key != curKey) { curKey = key; haveKey = true; s = x }
          else s = s + (x - s) / div
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](key, r.getLong(1), x, s), outSchema)
            : org.apache.spark.sql.Row
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
