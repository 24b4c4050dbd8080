package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming temporal join — the reference's ONLY join
  * (glassflow-api/internal/join/temporal.go, ~510 LoC), reproduced exactly
  * with flatMapGroupsWithState rather than approximated with Spark's
  * symmetric stream-stream join (which is all-pairs-in-window, not
  * latest-right-wins):
  *
  *  - right event → becomes the key's latest value (PutMessage overwrite,
  *    temporal.go:278), then ALL buffered left events for the key are
  *    drained: each emits one joined row and is deleted (temporal.go:149-213)
  *  - left event → probe the latest right: hit ⇒ emit immediately
  *    (temporal.go:215-265); miss ⇒ buffer the left (temporal.go:119-147)
  *  - per-side TTLs (= the two configured windows) decide expiry: an
  *    expired buffered left never matches; an expired right is not a hit
  *
  * State is partitioned by join key in the state store — the same
  * co-location the reference gets from single-threaded handlers + KV, but
  * shared-nothing across executors instead of one mutex (component/join.go:
  * 87-118 serializes everything; at 100 TB that mutex is the bottleneck,
  * a keyed state store is not).
  */
object TemporalJoin {

  /** Per-key state: buffered left events awaiting a right, and the latest
    * right value. Payloads are plain value arrays (kryo-serialized). */
  final case class JState(
    leftBuffer: List[(Long, Array[Any])],
    rightLatest: Option[(Long, Array[Any])])

  final case class Config(
    leftKey: String, rightKey: String,
    leftTs: String, rightTs: String,     // event-time columns (TimestampType)
    leftTtlMs: Long, rightTtlMs: Long,
    leftOut: Seq[AsOfJoin.Projection], rightOut: Seq[AsOfJoin.Projection],
    watermarkDelay: String = "10 seconds")

  /** One event inside a micro-batch for a single key: side 0 = right, 1 = left. */
  private[operators] final case class Ev(ts: Long, side: Int, payload: Array[Any])

  /** Pure per-key batch transition: apply `events` (already sorted by
    * (ts, side) — rights first at the same instant) to `st0`, returning
    * emitted (left, right) payload pairs and the new state.
    *
    * The left buffer is BOUNDED: after processing, buffered lefts older
    * than `wmMs − leftTtlMs` are pruned — any future right arrives with
    * event time above the watermark, so `rightTs − lts > leftTtlMs` holds
    * and the entry could never drain. Without this, a key receiving only
    * left events (the one-sided hot-key flood) accumulates every event
    * until a right shows up or the whole key times out; with it, state per
    * key is O(lefts inside the TTL horizon). The prune is output-neutral:
    * the drain path re-checks `ts − lts ≤ leftTtlMs` per emit. */
  private[operators] def step(events: Iterable[Ev], st0: JState, wmMs: Long,
                              leftTtlMs: Long, rightTtlMs: Long):
      (Vector[(Array[Any], Array[Any])], JState) = {
    var st = st0
    val out = Vector.newBuilder[(Array[Any], Array[Any])]
    events.foreach { e =>
      if (e.side == 0) {
        // latest right wins; drain every non-expired buffered left
        st.leftBuffer.reverse.foreach { case (lts, lp) =>
          if (e.ts - lts <= leftTtlMs) out += ((lp, e.payload))
        }
        st = JState(Nil, Some((e.ts, e.payload)))
      } else {
        st.rightLatest match {
          case Some((rts, rp)) if rts <= e.ts && e.ts - rts <= rightTtlMs =>
            out += ((e.payload, rp))
          case _ =>
            st = st.copy(leftBuffer = (e.ts, e.payload) :: st.leftBuffer)
        }
      }
    }
    val pruned = st.leftBuffer.filter { case (lts, _) => wmMs - lts <= leftTtlMs }
    (out.result(), st.copy(leftBuffer = pruned))
  }

  /** Key/projection fields resolve dotted names literal-first then as
    * nested paths — the reference's dual resolution (join/utils.go:16-40
    * reads fields with gjson, where `user.id` means either), so demo
    * configs keyed on `user.id` work against both a literal column of
    * that name and a `user` struct. */
  private def resolved(df: DataFrame, field: String): (org.apache.spark.sql.Column, DataType) = {
    val (c, dt) = graft.exprs.ExprCompiler.resolve(field.split('.').toSeq, df.schema)
    (c, dt.getOrElse(StringType))
  }

  def apply(left: DataFrame, right: DataFrame, cfg: Config): DataFrame = {
    val lType = StructType(cfg.leftOut.map(p =>
      StructField(p.as, resolved(left, p.field)._2, nullable = true)))
    val rType = StructType(cfg.rightOut.map(p =>
      StructField(p.as, resolved(right, p.field)._2, nullable = true)))
    val outSchema = StructType(lType.fields ++ rType.fields)

    val taggedL = left.select(
      resolved(left, cfg.leftKey)._1.cast(StringType).as("__k"), left(cfg.leftTs).as("__t"),
      lit(1).as("__side"),
      struct(cfg.leftOut.map(p => resolved(left, p.field)._1.as(p.as)): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val taggedR = right.select(
      resolved(right, cfg.rightKey)._1.cast(StringType).as("__k"), right(cfg.rightTs).as("__t"),
      lit(0).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(cfg.rightOut.map(p => resolved(right, p.field)._1.as(p.as)): _*).as("__r"))

    val union = taggedR.unionByName(taggedL).withWatermark("__t", cfg.watermarkDelay)

    implicit val stateEnc: Encoder[JState] = Encoders.kryo[JState]
    implicit val outEnc: Encoder[Row] = Encoders.row(outSchema)

    def tsMillis(r: Row): Long = r.get(1) match {
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case l: Long => l
    }
    def toArray(s: Row): Array[Any] = Array.tabulate(s.length)(s.get)
    def emit(l: Array[Any], r: Array[Any]): Row =
      new GenericRowWithSchema(l ++ r, outSchema)

    val maxTtl = math.max(cfg.leftTtlMs, cfg.rightTtlMs)

    union.groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroupsWithState[JState, Row](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[Row], state: GroupState[JState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // event-time order; rights before lefts at the same instant
            // (reference handler order: store right, then probe/drain)
            val events = it.toArray.sortBy(r => (tsMillis(r), r.getInt(2)))
              .map(r => Ev(tsMillis(r), r.getInt(2),
                toArray(r.getStruct(if (r.getInt(2) == 0) 4 else 3))))
            val st0 = state.getOption.getOrElse(JState(Nil, None))
            val wm = try state.getCurrentWatermarkMs() catch { case _: Exception => Long.MinValue }
            val (pairs, st) = step(events, st0, wm, cfg.leftTtlMs, cfg.rightTtlMs)
            state.update(st)
            if (events.nonEmpty) {
              val horizon = events.map(_.ts).max + maxTtl
              try state.setTimeoutTimestamp(horizon)
              catch { case _: IllegalArgumentException =>
                // horizon already behind the watermark: expire next batch
                try state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
                catch { case _: Exception => () }
              }
            }
            pairs.iterator.map { case (l, r) => emit(l, r) }
          }
      }
  }
}
