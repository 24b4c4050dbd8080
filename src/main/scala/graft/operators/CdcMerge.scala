package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Change-data-capture merge: apply an upsert/delete changelog to produce
  * the latest state per key (the MERGE INTO / compaction semantics every
  * warehouse sink needs — the reference's ClickHouse sink delegates this to
  * ReplacingMergeTree; here it is a first-class operator).
  *
  * The batch form is deliberately NOT a window + row_number: `max_by` over a
  * (seq-ordered) struct is an ordinary aggregate, so Spark's map-side
  * partial combine collapses each partition to ONE candidate row per key
  * before anything shuffles — on a 100 TB changelog where keys repeat
  * millions of times, the exchange carries |keys| rows, not |changes| rows,
  * and there is no per-key sort at all. A window formulation would shuffle
  * and sort the full changelog.
  */
object CdcMerge {

  /** Latest-wins compaction. `seqCols` is the total-order-within-key version
    * vector (e.g. ts, then a change id for ties); the winning row's
    * `deleteCol` decides whether the key survives. Output: key + the
    * winning row's `payloadCols` (delete winners are dropped).
    *
    * Correctness does not depend on partitioning or arrival order: struct
    * `max` is associative/commutative, and `seqCols` totally orders each
    * key's changes, so every combine tree yields the same winner. */
  def applyChangelog(df: DataFrame, keyCols: Seq[String], seqCols: Seq[String],
      deleteCol: String, payloadCols: Seq[String]): DataFrame = {
    val winner = struct((seqCols ++ (deleteCol +: payloadCols)).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(winner).as("_w"))
      .filter(!col(s"_w.$deleteCol"))
      .select(keyCols.map(col) ++
        (seqCols ++ payloadCols).map(c => col(s"_w.$c").as(c)): _*)
  }

  /** Snapshot differencing — the INVERSE of [[applyChangelog]]: given two
    * keyed snapshots of the same entity set, emit the changelog that turns
    * `oldSnap` into `newSnap` (`op` = I/U/D; unchanged keys are dropped).
    * The incremental-export / reverse-ETL primitive: a warehouse that can
    * only produce full snapshots still needs deltas to feed downstream
    * systems, and diffing two snapshots is how those deltas are recovered.
    *
    * Output: key columns, `op`, then `old_<attr>` / `new_<attr>` per attr
    * (null on the absent side of an insert/delete). Attribute comparison is
    * null-safe, so a null→value transition is a genuine update.
    *
    * Scale shape: ONE full-outer sort-merge/hash join keyed by the snapshot
    * key — both sides shuffle once on the same key, nothing else moves.
    * Unchanged keys (the overwhelming majority of a day-over-day diff) are
    * filtered scan-side post-join, so the output is delta-sized, and the
    * filter is a codegen'd null-safe struct compare, not a UDF. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(keyCols.map(col) ++
      attrCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__in_old"): _*)
    val n = newSnap.select(keyCols.map(col) ++
      attrCols.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__in_new"): _*)
    val changed = attrCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, lit("I"))
          .when(col("__in_new").isNull, lit("D"))
          .otherwise(lit("U")))
      .filter(col("op") =!= "U" || changed)
      .select(keyCols.map(col) ++ (col("op") +:
        attrCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }

  /** STREAMING latest-wins state: per key, hold only (best seq vector,
    * payload) — O(1) state per key regardless of how many changes arrive —
    * and emit the final surviving row once the key goes inactive past the
    * watermark (the Funnel finalize-on-inactivity shape, so burst results
    * match [[applyChangelog]] exactly, independent of arrival order).
    * Delete winners emit nothing.
    *
    * Generic payload travels as a JSON string (state must round-trip
    * Spark's state-store encoder; a production caller with a fixed schema
    * would use a case-class Encoder instead). Key must be LongType;
    * `seqCol` a long (micros in this codebase); `tsCol` the event-time
    * timestamp column used for watermarking. */
  def applyChangelogStreaming(df: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, deleteCol: String, payloadJsonCol: String,
      gapMs: Long, watermarkDelay: String = "10 seconds"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(keyCol, LongType, nullable = true),
      StructField(seqCol, LongType, nullable = true),
      StructField(payloadJsonCol, StringType, nullable = true)))
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Long, Boolean, String)] =
      Encoders.product[(Long, Boolean, String)]
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    def tsMillis(r: Row): Long = r.get(1) match {
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case l: Long => l
    }
    df.select(col(keyCol).cast(LongType).as("__k"), col(tsCol).as("__ts"),
        col(seqCol).cast(LongType).as("__seq"),
        col(deleteCol).cast(BooleanType).as("__del"),
        col(payloadJsonCol).cast(StringType).as("__pay"))
      .withWatermark("__ts", watermarkDelay)
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroupsWithState[(Long, Boolean, String), Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Row], state: GroupState[(Long, Boolean, String)]) =>
          if (state.hasTimedOut) {
            val (seq, del, pay) = state.get
            state.remove()
            if (del) Iterator.empty
            else Iterator.single(new GenericRowWithSchema(
              Array[Any](key, seq, pay), outSchema): Row)
          } else {
            var best = state.getOption.getOrElse((Long.MinValue, true, null: String))
            var lastMs = Long.MinValue
            it.foreach { r =>
              lastMs = math.max(lastMs, tsMillis(r))
              val seq = r.getLong(2)
              if (seq > best._1) best = (seq, r.getBoolean(3), r.getString(4))
            }
            state.update(best)
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
