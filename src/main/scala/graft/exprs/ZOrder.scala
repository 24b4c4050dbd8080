package graft.exprs

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) curve key: interleave the low 31 bits of two
  * non-negative longs into a 62-bit space-filling-curve value. Sorting or
  * range-partitioning 100 TB of parquet by `interleave_bits(x, y)` clusters
  * rows that are close in BOTH dimensions into the same files, so min/max
  * file statistics prune scans for 2-D predicates (time × tenant, lat ×
  * lon) — the data-layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
  * expressed here as a plain codegen'd expression usable in any
  * `repartitionByRange`/`sortWithinPartitions`/write pipeline. */
object ZOrderFunctions {

  /** Bit-spread via the classic parallel-prefix masks (Morton 1966 curve;
    * 2-D spread-by-shift-and-mask formulation as in the public
    * bit-twiddling literature): x with 31 significant bits → every bit at
    * position 2i. */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton key: x's bits at even positions, y's at odd. */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

/** `interleave_bits(x, y)` — codegen'd Morton key over the low 31 bits of
  * each input (negative inputs are masked like any other: only the low 31
  * bits participate). */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits requires (bigint, bigint), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderFunctions.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.exprs.ZOrderFunctions.interleave($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  def interleaveBits(x: Column, y: Column): Column =
    GraftColumnBridge.column(InterleaveBits(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interleave_bits", exprs => InterleaveBits(exprs.head, exprs(1)), "built-in")
}
