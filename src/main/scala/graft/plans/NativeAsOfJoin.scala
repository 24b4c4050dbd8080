package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** The as-of join promoted to a first-class Catalyst operator — tier (c)
  * of the custom-operator ladder: a logical node, a planner [[SparkStrategy]],
  * and a physical exec that declares its distribution/ordering
  * REQUIREMENTS instead of imperatively repartitioning. That declaration
  * is the point: `EnsureRequirements` inserts the hash exchanges and
  * in-partition sorts only when the children aren't already partitioned
  * and sorted correctly — so an upstream bucketed layout or an earlier
  * keyed exchange is REUSED for free, where the DataFrame-level
  * [[graft.operators.AsOfJoin.sortMerge]] (repartition + sortWithinPartitions
  * + mapPartitions) always pays its own shuffle and sort. Semantics match
  * sortMerge's inner form: for each left row, the latest right row with
  * the same key, `rightTs ≤ leftTs`, within `windowNs`.
  *
  * Execution is a per-partition two-iterator merge (both children arrive
  * sorted by (key, ts)): O(1) state — the last in-window right row per
  * key — no pair materialization, no per-key buffering, hot keys cannot
  * OOM a task. Keys and timestamps must be LongType (the caller casts).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    windowNs: Long) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, windowNs: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides by key; EnsureRequirements adds exchanges
  // only where the existing partitioning doesn't already satisfy this
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyIdx >= 0 && lTsIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0,
      "as-of join key/ts attributes must survive into child output")
    val window = windowNs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var lastRightKey = 0L
      var lastRightTs = Long.MinValue
      var lastRight: InternalRow = null
      lIter.flatMap { lRow =>
        val k = lRow.getLong(lKeyIdx)
        val t = lRow.getLong(lTsIdx)
        // advance the right side through every row usable by this (or a
        // later) left row: key below ours, or same key with ts ≤ ours
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val rk = head.getLong(rKeyIdx)
          val rt = head.getLong(rTsIdx)
          if (rk < k || (rk == k && rt <= t)) {
            if (rk == k) { // candidate for us — remember a copy
              lastRightKey = rk
              lastRightTs = rt
              lastRight = head.copy()
            }
            rBuf.next()
          } else advancing = false
        }
        if (lastRight != null && lastRightKey == k &&
            t - lastRightTs <= window) {
          Iterator.single(proj(joined(lRow, lastRight)))
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: [[AsOfJoinNode]] → [[AsOfJoinExec]]. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, w) =>
      AsOfJoinExec(lk, lt, rk, rt, w, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public entry: `NativeAsOfJoin.join(left, right, ...)` — installs the
  * strategy on the session (idempotently) and builds the logical node
  * from the analyzed child plans. The right side is re-aliased so a
  * self-join (both sides carved from one scan) gets fresh expression ids
  * — without it, duplicate ids would make output binding ambiguous. */
object NativeAsOfJoin {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String, rightKey: String, rightTs: String,
      windowNs: Long): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${p.output.map(_.name).mkString(", ")}"))
    val (lk, lt) = (attr(lp, leftKey), attr(lp, leftTs))
    val (rk, rt) = (attr(rp, rightKey), attr(rp, rightTs))
    Seq(lk, lt, rk, rt).foreach(a => require(a.dataType == LongType,
      s"as-of key/ts columns must be bigint, got ${a.name}: ${a.dataType}"))
    GraftDatasetBridge.ofRows(spark, AsOfJoinNode(lp, rp, lk, lt, rk, rt, windowNs))
  }
}
