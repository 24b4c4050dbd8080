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

  /** One-sided integer CUSUM change-point statistic per key (Page 1954):
    * `s₀ = max(0, x₀ − drift)`, `sᵢ = max(0, sᵢ₋₁ + xᵢ − drift)` — the
    * classic upward-shift detector: the statistic accumulates excess over
    * the `drift` allowance and resets at zero, so a sustained level shift
    * grows `s` linearly while in-control noise keeps it pinned near zero.
    * Pure integer arithmetic — bit-deterministic across engines and
    * partitionings where a float CUSUM is not.
    *
    * The reset (`max(0, ·)`) makes the recurrence non-linear, so no
    * built-in window expresses it — same genuine ordered-scan tier as
    * [[ewmaInt]]: repartition by key, sort within partitions, one linear
    * pass with O(1) state per key; keys are shared-nothing, nothing is
    * collected. Input columns (`keyCol`: long, `tsCol`: long, `valueCol`:
    * long) with (key, ts) unique; output appends `cusum`. */
  def cusumInt(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      drift: Long): DataFrame = {
    val inSchema = df.select(col(keyCol), col(tsCol), col(valueCol)).schema
    val outSchema = org.apache.spark.sql.types.StructType(
      inSchema.fields :+ org.apache.spark.sql.types.StructField(
        "cusum", org.apache.spark.sql.types.LongType, nullable = false))
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
          if (!haveKey || key != curKey) { curKey = key; haveKey = true; s = 0L }
          s = math.max(0L, s + x - drift)
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](key, r.getLong(1), x, s), outSchema)
            : org.apache.spark.sql.Row
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Integer Holt double-exponential smoothing per key (Holt 1957): level
    * AND trend state, the one-step forecasting recurrence —
    * `s₀ = x₀, b₀ = 0`; then
    * `sᵢ = sᵢ₋₁ + bᵢ₋₁ + (xᵢ − sᵢ₋₁ − bᵢ₋₁) / 2^a` and
    * `bᵢ = bᵢ₋₁ + (sᵢ − sᵢ₋₁ − bᵢ₋₁) / 2^c` (truncating division), with
    * the one-step-ahead forecast `sᵢ + bᵢ` emitted per row. [[ewmaInt]]
    * tracks level only and lags any trending series by a constant; the
    * trend term closes that lag — the standard next-step capacity /
    * load-forecast shape.
    *
    * Same genuine ordered-scan tier as [[ewmaInt]] (two coupled carried
    * states — no built-in window): repartition by key, in-partition sort,
    * one linear pass, O(1) state, shared-nothing keys, bit-deterministic
    * integers. Output appends `level`, `trend`, `forecast`. */
  def holtInt(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      a: Int, c: Int): DataFrame = {
    require(a >= 0 && a < 63 && c >= 0 && c < 63, s"shifts in [0,62]: $a, $c")
    val da = 1L << a
    val dc = 1L << c
    val inSchema = df.select(col(keyCol), col(tsCol), col(valueCol)).schema
    val outSchema = org.apache.spark.sql.types.StructType(inSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("level",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("trend",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("forecast",
        org.apache.spark.sql.types.LongType, nullable = false)))
    df.select(col(keyCol), col(tsCol), col(valueCol))
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol))
      .mapPartitions { rows =>
        var curKey = 0L
        var haveKey = false
        var sL = 0L
        var bT = 0L
        rows.map { r =>
          val key = r.getLong(0)
          val x = r.getLong(2)
          if (!haveKey || key != curKey) {
            curKey = key; haveKey = true; sL = x; bT = 0L
          } else {
            val base = sL + bT
            val sNew = base + (x - base) / da
            bT = bT + (sNew - base) / dc
            sL = sNew
          }
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array[Any](key, r.getLong(1), x, sL, bT, sL + bT), outSchema)
            : org.apache.spark.sql.Row
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** STREAMING form of [[ewmaInt]]: per-key buffered `(ts, value)` samples,
    * finalized by replaying the exact batch recurrence (sorted by `tusCol`)
    * when the key goes inactive — event-time timeout `gapMs` past the
    * key's latest sample, the [[Funnel.firstTouchStreaming]] shape. Burst
    * results therefore match the batch operator under ANY arrival order:
    * the smoothing order comes from the buffered timestamps, never from
    * arrival.
    *
    * `tsCol` must be a timestamp column (drives watermark + timeout);
    * `tusCol` a long micros column carried as payload so the emitted rows
    * keep the full precision flatMapGroupsWithState's ms-domain timers
    * don't (timers only decide WHEN to finalize — never feed arithmetic).
    * Output: (key, tus, value, ewma) — identical to the batch operator.
    *
    * Scale shape: one keyed state-store exchange; state per key is the
    * in-TTL sample buffer (bounded by the inactivity gap × event rate, the
    * same bound every buffer-then-finalize operator here carries), and
    * keys are shared-nothing. */
  def ewmaIntStreaming(df: DataFrame, keyCol: String, tsCol: String,
                       tusCol: String, valueCol: String, k: Int, gapMs: Long,
                       watermarkDelay: String = "10 seconds"): DataFrame = {
    require(k >= 0 && k < 63, s"k must be in [0, 62]: $k")
    val div = 1L << k
    replayStreaming(df, keyCol, tsCol, tusCol, valueCol, "ewma", gapMs,
      watermarkDelay)(init = x => x, step = (s, x) => s + (x - s) / div)
  }

  /** STREAMING form of [[cusumInt]] — the same buffer-then-finalize shape
    * as [[ewmaIntStreaming]] (per-key in-TTL sample buffer, exact batch
    * recurrence replayed on event-time inactivity, arrival-order
    * independent); shares the batch operator's oracle. */
  def cusumIntStreaming(df: DataFrame, keyCol: String, tsCol: String,
                        tusCol: String, valueCol: String, drift: Long,
                        gapMs: Long,
                        watermarkDelay: String = "10 seconds"): DataFrame =
    replayStreaming(df, keyCol, tsCol, tusCol, valueCol, "cusum", gapMs,
      watermarkDelay)(init = x => math.max(0L, x - drift),
      step = (s, x) => math.max(0L, s + x - drift))

  /** Shared buffer-then-finalize core for single-long-state recurrences
    * ([[ewmaIntStreaming]], [[cusumIntStreaming]]): per-key buffered
    * `(tus, value)` samples, finalized by replaying
    * `init`/`step` over the buffer sorted by `tusCol` when the key goes
    * inactive `gapMs` past its latest sample. Timers only decide WHEN to
    * finalize — the replay order comes from the buffered micros payload,
    * never from arrival, so burst results match the batch operator under
    * ANY arrival order. State per key is the in-TTL sample buffer
    * (bounded by inactivity gap × event rate); keys are shared-nothing. */
  private def replayStreaming(df: DataFrame, keyCol: String, tsCol: String,
      tusCol: String, valueCol: String, outName: String, gapMs: Long,
      watermarkDelay: String)(
      init: Long => Long, step: (Long, Long) => Long): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField(keyCol, LongType, nullable = true),
      StructField(tusCol, LongType, nullable = true),
      StructField(valueCol, LongType, nullable = true),
      StructField(outName, LongType, nullable = false)))
    // State = parallel (ts, value) seqs — same product-encoded shape as
    // Funnel.firstTouchStreaming's buffer.
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Seq[Long], Seq[Long])] =
      Encoders.product[(Seq[Long], Seq[Long])]
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    df.select(col(keyCol).cast(LongType).as("__k"), col(tsCol).as("__ts"),
        col(tusCol).cast(LongType).as("__tus"),
        col(valueCol).cast(LongType).as("__v"))
      .withWatermark("__ts", watermarkDelay)
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroupsWithState[(Seq[Long], Seq[Long]), Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Row],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[Long], Seq[Long])]) =>
          if (state.hasTimedOut) {
            val (tss, vs) = state.get
            state.remove()
            val buf = tss.zip(vs).sortBy(_._1)
            var s = 0L
            var first = true
            buf.iterator.map { case (tus, x) =>
              if (first) { s = init(x); first = false } else s = step(s, x)
              new GenericRowWithSchema(
                Array[Any](key, tus, x, s), outSchema): Row
            }
          } else {
            val fresh = it.map(r => (r.getLong(2), r.getLong(3))).toSeq
            val (tss, vs) = state.getOption.getOrElse((Seq.empty[Long], Seq.empty[Long]))
            val merged = (tss ++ fresh.map(_._1), vs ++ fresh.map(_._2))
            state.update(merged)
            val lastMs = merged._1.max / 1000L
            try state.setTimeoutTimestamp(lastMs + gapMs + 1)
            catch { case _: IllegalArgumentException =>
              try state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
              catch { case _: Exception => () }
            }
            Iterator.empty
          }
      }
  }
}
