package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed deduplication — the reference's dedup stage
  * (glassflow-api/internal/deduplication/badger/deduplication.go:30-103;
  * processor/dedup_processor.go:32-82).
  *
  * Semantics: a record is a duplicate iff its key was seen on a KEPT record
  * within the configured time window ("since-last-kept": dropped duplicates
  * do NOT refresh the TTL, because the reference only commits keys of
  * messages that passed — streaming_component.go:289-338).
  *
  * Three implementations, all partitioned by the dedup key so every
  * duplicate lands on the same task (the reference does the same with
  * hash(dedupKey)%N subject sharding, ingestor/processor.go:154-176):
  *  - [[exact]]: batch keep-one-per-key (no window), deterministic winner.
  *  - [[windowedBatch]]: batch since-last-kept scan. repartition(key) +
  *    sortWithinPartitions + one linear pass — O(n log n) per partition, no
  *    per-key state collection, so a hot key cannot OOM a task. Scales to
  *    any key cardinality; AQE handles size skew between partitions.
  *  - [[windowedStreaming]]: Structured Streaming
  *    dropDuplicatesWithinWatermark (state-store backed, exactly-once with
  *    checkpointing — the idiomatic Spark form of the probe/commit dance).
  */
object DedupOp {

  /** Keep exactly one row per key: the first by `order` (ties impossible if
    * order contains a unique column — pass one to keep this deterministic). */
  def exact(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Batch since-last-kept windowed dedup over an exact integer event-time
    * column (nanos). Keeps a row iff no kept row with the same key exists in
    * (ts - windowNs, ts]. First row per key always kept; ties broken by
    * `tieBreak` column ascending (kept row wins ordering). */
  def windowedBatch(keyCols: Seq[String], tsNsCol: String, windowNs: Long,
                    tieBreak: String)(df: DataFrame): DataFrame = {
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsNsCol)
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols.map(col) :+ col(tsNsCol) :+ col(tieBreak)): _*)
    sorted.mapPartitions { rows =>
      // one linear pass: partition is sorted by (key, ts); a key change
      // resets the last-kept timestamp
      var curKey: Seq[Any] = null
      var lastKept = Long.MinValue
      rows.flatMap { r =>
        val k = keyIdx.map(r.get)
        val ts = r.getLong(tsIdx)
        if (curKey == null || k != curKey) { curKey = k; lastKept = ts; Some(r) }
        else if (ts - lastKept > windowNs) { lastKept = ts; Some(r) }
        else None
      }
    }(Encoders.row(schema))
  }

  /** Streaming windowed dedup: the idiomatic Spark form. State TTL and
    * exactly-once visibility come from the state store + checkpoint
    * (replaces the reference's FilterDuplicates/SaveKeys commit ordering).
    *
    * NOTE on semantics: this keeps the FIRST occurrence per key until the
    * watermark expires the state ("since-first-seen"). The reference's TTL
    * restarts from the last KEPT record; for exact parity (a key re-emitted
    * every window-length is kept each time) use [[windowedStreamingExact]]. */
  def windowedStreaming(keys: Seq[String], tsCol: String, window: String)(df: DataFrame): DataFrame =
    df.withWatermark(tsCol, window)
      .dropDuplicatesWithinWatermark(keys)

  /** Exact reference semantics in streaming: per-key last-kept-timestamp
    * state; a record is kept iff ts − lastKept > window; dropped records do
    * NOT refresh the TTL. State expires via event-time timeout.
    * `tieBreak` (a long column) makes the kept row among equal-millisecond
    * events deterministic; without it the winner is arrival order. */
  def windowedStreamingExact(keys: Seq[String], tsCol: String, windowMs: Long,
                             watermarkDelay: String = "10 seconds",
                             tieBreak: Option[String] = None)(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
    val schema = df.schema
    val tsIdx = schema.fieldIndex(tsCol)
    val keyIdx = keys.map(schema.fieldIndex)
    val tieIdx = tieBreak.map(schema.fieldIndex)
    implicit val stateEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(schema)
    def tsMillis(r: Row): Long = r.get(tsIdx) match {
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case l: Long => l
    }
    df.withWatermark(tsCol, watermarkDelay)
      .groupByKey(r => keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u0000"))(Encoders.STRING)
      .flatMapGroupsWithState[Long, Row](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val events = it.toArray.sortBy(r =>
              (tsMillis(r), tieIdx.map(r.getLong).getOrElse(0L)))
            var lastKept = state.getOption.getOrElse(Long.MinValue)
            val out = events.filter { r =>
              val ts = tsMillis(r)
              val keep = lastKept == Long.MinValue || ts - lastKept > windowMs
              if (keep) lastKept = ts
              keep
            }
            if (lastKept != Long.MinValue) {
              state.update(lastKept)
              try state.setTimeoutTimestamp(lastKept + windowMs + 1)
              catch { case _: IllegalArgumentException =>
                try state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
                catch { case _: Exception => () }
              }
            }
            out.iterator.map(r => new GenericRowWithSchema(
              Array.tabulate(schema.length)(r.get), schema): Row)
          }
      }
  }
}
