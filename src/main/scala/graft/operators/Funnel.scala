package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Ordered first-touch funnel: per key, the earliest step-1 event, then the
  * earliest step-2 event STRICTLY after it, then the earliest step-3 event
  * strictly after that, and so on.
  *
  * The compose-built-ins formulation is a chain of N groupBy-min +
  * join-back rounds — N shuffles of the event set plus N joins. This
  * operator does it in ONE shuffle: prune to funnel-step rows (the filter
  * reaches the scan, so at 100 TB only the funnel event types are ever
  * read), repartition by key, sort within partitions by (key, ts), and run
  * a per-key state machine in a single linear pass — the same shape as
  * [[AsOfJoin.sortMerge]]. State per key is one timestamp per step, so hot
  * keys cost memory O(steps), not O(events).
  *
  * Determinism: step timestamps are minima under a strictly-greater
  * predicate, so the result is independent of sort-tie order between
  * equal-timestamp events.
  */
object Funnel {

  /** @param steps ordered step values of `stepCol` (e.g. view, click,
    *              purchase); rows with other values are pruned pre-shuffle.
    * @param tsCol long event time (epoch micros in this codebase).
    * @return one row per key that reached step 1: key, `reached` (1..N),
    *         and nullable `ts_i` columns, `ts_i` = first-touch time of
    *         step i. */
  def firstTouch(df: DataFrame, keyCol: String, tsCol: String,
                 stepCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    val n = steps.size
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(stepCol) === s, lit(i)).otherwise(acc)
      }
    val keyType = df.schema(keyCol).dataType
    val outSchema = StructType(
      StructField(keyCol, keyType, nullable = true) +:
      StructField("reached", IntegerType, nullable = false) +:
      steps.indices.map(i => StructField(s"ts_${i + 1}", LongType, nullable = true)))

    val sorted = df
      .filter(col(stepCol).isin(steps.map(lit): _*))
      .select(col(keyCol).as("__k"), col(tsCol).cast(LongType).as("__ts"),
        stepIdx.as("__step"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__ts"))

    sorted.mapPartitions { rows =>
      var curKey: Any = null
      var haveKey = false
      val times = new Array[Long](n)
      val set = new Array[Boolean](n)
      def emit(): Option[Row] =
        if (haveKey && set(0)) {
          var reached = 1
          while (reached < n && set(reached)) reached += 1
          val vals = new Array[Any](n + 2)
          vals(0) = curKey
          vals(1) = reached
          var i = 0
          while (i < n) {
            vals(i + 2) = if (set(i)) times(i) else null
            i += 1
          }
          Some(new GenericRowWithSchema(vals, outSchema): Row)
        } else None
      val out = rows.flatMap { r =>
        val k = r.get(0)
        val prev = if (!haveKey || k != curKey) {
          val e = emit()
          curKey = k; haveKey = true
          java.util.Arrays.fill(set, false)
          e
        } else None
        val ts = r.getLong(1)
        val idx = r.getInt(2)
        if (idx == 0) {
          if (!set(0)) { times(0) = ts; set(0) = true }
        } else if (!set(idx) && set(idx - 1) && ts > times(idx - 1)) {
          times(idx) = ts; set(idx) = true
        }
        prev
      }
      out ++ emit().iterator
    }(Encoders.row(outSchema))
  }

  /** Run the strictly-greater transition over a time-sorted (ts, step)
    * buffer. Returns (reached, per-step first-touch or null). Output values
    * are tie-order independent: each recorded timestamp is a minimum under
    * conditions that only compare against earlier minima. */
  private[operators] def finalizeFunnel(n: Int,
                                  buf: Seq[(Long, Int)]): (Int, IndexedSeq[Any]) = {
    val times = new Array[Long](n)
    val set = new Array[Boolean](n)
    buf.sortBy(_._1).foreach { case (ts, idx) =>
      if (idx == 0) {
        if (!set(0)) { times(0) = ts; set(0) = true }
      } else if (!set(idx) && set(idx - 1) && ts > times(idx - 1)) {
        times(idx) = ts; set(idx) = true
      }
    }
    var reached = 0
    while (reached < n && set(reached)) reached += 1
    (reached, (0 until n).map(i => if (set(i)) times(i): Any else null))
  }

  /** STREAMING form: per-key funnel emitted when the key goes inactive for
    * `gapMs` of event time (state then clears — each inactivity burst gets
    * its own funnel row). Step events are buffered per key and the batch
    * transition runs once at emission, so the result over a burst is
    * EXACTLY the batch operator's, independent of arrival order — the
    * buffer is bounded by the key's step events inside one burst, the same
    * bounded-buffer story as TemporalJoin's left buffer. Key column must be
    * LongType; timestamps are event-time milliseconds
    * (flatMapGroupsWithState's native precision). */
  def firstTouchStreaming(df: DataFrame, keyCol: String, tsCol: String,
                          stepCol: String, steps: Seq[String], gapMs: Long,
                          watermarkDelay: String = "10 seconds"): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    val n = steps.size
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(stepCol) === s, lit(i)).otherwise(acc)
      }
    val outSchema = StructType(
      StructField(keyCol, LongType, nullable = true) +:
      StructField("reached", IntegerType, nullable = false) +:
      steps.indices.map(i => StructField(s"ts_${i + 1}", LongType, nullable = true)))
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Seq[Long], Seq[Int])] =
      Encoders.product[(Seq[Long], Seq[Int])]
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    val pruned = df
      .filter(col(stepCol).isin(steps.map(lit): _*))
      .select(col(keyCol).cast(LongType).as("__k"), col(tsCol).as("__ts"),
        stepIdx.as("__step"))
      .withWatermark("__ts", watermarkDelay)
    def tsMillis(r: Row): Long = r.get(1) match {
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case l: Long => l
    }
    pruned
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroupsWithState[(Seq[Long], Seq[Int]), Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Row], state: GroupState[(Seq[Long], Seq[Int])]) =>
          if (state.hasTimedOut) {
            val (tss, idxs) = state.get
            state.remove()
            val (reached, touches) = finalizeFunnel(n, tss.zip(idxs))
            if (reached > 0)
              Iterator.single(new GenericRowWithSchema(
                (key: Any) +: (reached: Any) +: touches.toArray, outSchema): Row)
            else Iterator.empty
          } else {
            val fresh = it.map(r => (tsMillis(r), r.getInt(2))).toSeq
            val (tss, idxs) = state.getOption.getOrElse((Seq.empty[Long], Seq.empty[Int]))
            val merged = (tss ++ fresh.map(_._1), idxs ++ fresh.map(_._2))
            state.update(merged)
            val lastTs = merged._1.max
            try state.setTimeoutTimestamp(lastTs + gapMs + 1)
            catch { case _: IllegalArgumentException =>
              try state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
              catch { case _: Exception => () }
            }
            Iterator.empty
          }
      }
  }
}
