package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — group a keyed event stream into sessions separated
  * by inactivity gaps, the classic clickstream/telemetry rollup the reference
  * feeds ClickHouse for (events landed by the ingest pipeline are queried as
  * sessions downstream; this makes the rollup a first-class operator).
  *
  * Two forms with identical semantics:
  *  - [[batch]]: gaps-and-islands over history. One shuffle (window partition
  *    by key), then a linear pass per key — the same shape Spark gives any
  *    keyed window, so a 100 TB backfill partitions by key and never
  *    all-pairs. Session identity = (key, session_start).
  *  - [[streaming]]: Structured Streaming's native `session_window` with a
  *    watermark — merging session state is handled by the stateful operator,
  *    emitted on watermark close. Same output schema, so batch backfill and
  *    live stream union cleanly (the lambda-architecture contract).
  *
  * Aggregates are chosen for run-to-run determinism at scale: counts,
  * min/max timestamps, and an exact integer cents total (double `sum` over a
  * shuffled partitioning is order-dependent in the last ulp; money-like
  * columns aggregate exactly or not at all).
  */
object Sessionize {

  private def aggCols(tsCol: String, cents: Option[Column]): Seq[Column] =
    Seq(min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++ cents.map(c => sum(c).as("value_cents"))

  /** Session summaries from a batch table.
    *
    * @param gapMicros inactivity gap: an event at least this long after the
    *                  previous event of the same key starts a new session
    *                  (diff ≥ gap splits — the half-open [start, start+gap)
    *                  merge rule of Spark's `session_window`, so batch and
    *                  streaming agree on boundary-exact spacing).
    * @param valueCol  optional numeric column totalled per session as exact
    *                  cents (`round(v*100)` summed as long).
    */
  def batch(df: DataFrame, keyCol: String, tsCol: String, gapMicros: Long,
            valueCol: Option[String] = None): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prevTs = lag(col(tsCol), 1).over(byKey)
    val isNewSession = when(
      prevTs.isNull || unix_micros(col(tsCol)) - unix_micros(prevTs) >= gapMicros, 1L)
      .otherwise(0L)
    val sessionNo = sum(isNewSession)
      .over(Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val cents = valueCol.map(v => round(col(v) * 100).cast("long"))
    val withSession = df.withColumn("session_no", sessionNo)
    withSession
      .groupBy(col(keyCol), col("session_no"))
      .agg(aggCols(tsCol, cents).head, aggCols(tsCol, cents).tail: _*)
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
      .drop("session_no")
  }

  /** Streaming sessionization via the native `session_window` stateful
    * operator. Emits closed sessions (append mode) once the watermark passes
    * the session end. Output schema matches [[batch]] minus `session_no`
    * bookkeeping, so the two compose.
    */
  def streaming(df: DataFrame, keyCol: String, tsCol: String, gap: String,
                watermarkDelay: String, valueCol: Option[String] = None): DataFrame = {
    val cents = valueCol.map(v => round(col(v) * 100).cast("long"))
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(aggCols(tsCol, cents).head, aggCols(tsCol, cents).tail: _*)
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
      .drop("session_window")
  }
}
