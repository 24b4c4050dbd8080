package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial radius self-join via uniform grid bucketing — the canonical
  * distributed shape for "all point pairs within distance r": cut the
  * plane into cells of width ≥ r, and any qualifying pair must sit in the
  * same or an adjacent cell, so candidates meet in a HASH join on cell id
  * instead of the all-pairs cross product a raw distance predicate plans
  * to (the BroadcastNestedLoopJoin class the plan guard bans).
  *
  * Coordinates are integer micro-units (micro-degrees for geo at planar
  * approximation, millimeters for floor plans — the caller picks the
  * unit); distances compare SQUARED in int64, so the join is
  * bit-deterministic with no sqrt or float anywhere.
  *
  * Each unordered pair is emitted exactly once without a distinct pass:
  * only the smaller-id point's 3×3 neighborhood replication can meet the
  * larger-id point's home cell under the `a_id < b_id` filter — the
  * replicated orientation of the larger id is cut by the same filter.
  *
  * Scale shape: constant 9× replication of one side (points, not pairs),
  * one equi hash join keyed by cell, scan-local integer verify. Cell
  * width trades replication overlap against per-cell density; AQE splits
  * residual hot cells. Degenerate skew (everything in one cell) is the
  * caller's cellWidth misconfiguration, same as any grid index.
  */
object SpatialJoin {

  /** Pairs of `points(idCol, xCol, yCol)` (integer micro-units) within
    * euclidean distance `radius`: `(a_id, b_id, dist2)` with
    * `dist2 = Δx² + Δy²` ≤ `radius²`. Requires `cellWidth ≥ radius`. */
  def radiusPairs(points: DataFrame, idCol: String, xCol: String, yCol: String,
                  radius: Long, cellWidth: Long): DataFrame = {
    require(cellWidth >= radius && radius > 0,
      s"need cellWidth >= radius > 0, got cellWidth=$cellWidth radius=$radius")
    val p = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    // floor division toward -infinity (pmod keeps the remainder
    // non-negative, so the numerator is exactly divisible) — `div` alone
    // truncates toward zero and mis-cells negative coordinates. The
    // intermediate double division is exact: the numerator is a multiple
    // of cellWidth and micro-unit coordinates sit far below 2^53.
    def cell(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(cellWidth))) / lit(cellWidth)).cast("long")
    val home = p.withColumn("cx", cell(col("x"))).withColumn("cy", cell(col("y")))
    val exploded = home
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    exploded
      .join(home.select(col("id").as("b_id"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= radius * radius)
      .select(col("a_id"), col("b_id"), col("dist2"))
  }
}
