package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * Spark turns a pure inequality join (`p >= s AND p < e`) into a
  * BroadcastNestedLoopJoin — O(|intervals| x |points|) comparisons, which is
  * the operator that dies first at 100 TB. The classic fix is to manufacture
  * an equi-key: cover the time axis with fixed-width buckets, explode each
  * interval into the buckets it overlaps, map each point to the single bucket
  * containing it, and equi-join on the bucket before applying the exact
  * containment predicate. The equi-join hash-shuffles both sides on the
  * bucket id, so the work distributes like any other join; AQE's skew
  * splitting handles a hot bucket (a time spike) the same way it handles a
  * hot join key.
  *
  * Each matching (interval, point) pair is produced exactly once — a point
  * lives in exactly one bucket and `sequence` emits each bucket id once — so
  * no post-join dedup is needed.
  *
  * `bucketWidth` trades explosion factor against candidate selectivity: with
  * intervals of bounded length L, `bucketWidth >= L` caps the per-interval
  * fan-out at 2 rows. Correctness does not depend on the choice — any
  * positive width is exact — only the constant factor does.
  */
object RangeJoin {

  /** Join `points` to the `intervals` that contain them: emits one row per
    * (interval, point) pair with `startCol <= pointCol < endCol` carrying the
    * columns of both inputs. Time columns must be non-negative longs in a
    * shared unit (epoch micros in this codebase) and column names must not
    * collide between the two inputs. Empty or inverted intervals
    * (`end <= start`) match nothing and are dropped up front.
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
                      startCol: String, endCol: String, pointCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet)
    require(overlap.isEmpty, s"column names collide across sides: $overlap")
    val bucket = "__rj_bucket"
    // `div` truncates toward zero = floor on the non-negative domain; long
    // arithmetic throughout (double floor loses exactness past 2^52, which
    // epoch nanos exceed).
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn(bucket, explode(sequence(
        expr(s"$startCol div $bucketWidth"),
        expr(s"($endCol - 1) div $bucketWidth"))))
    val pt = points.withColumn(bucket, expr(s"$pointCol div $bucketWidth"))
    iv.join(pt, Seq(bucket))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(bucket)
  }
}
