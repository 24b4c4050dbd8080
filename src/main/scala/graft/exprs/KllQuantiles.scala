package graft.exprs

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Datasketches KLL, Karnin/Lang/Liberty
  * FOCS'16) — the third mergeable-sketch family here beside HLL
  * (distinct counts) and SpaceSaving (frequent items), covering the
  * remaining dashboard-rollup aggregate: percentiles that can be
  * re-aggregated along any dimension WITHOUT rescanning raw data.
  *
  * `kll_sketch_agg(longCol, k)` builds a per-group sketch (BinaryType,
  * the portable Datasketches wire format — readable by any Datasketches
  * binding); `kll_merge_agg(sketchCol, k)` unions serialized sketches;
  * [[KllQuantiles.quantile]] reads a rank estimate out. Sketch size and
  * single-sided normalized rank error are set by `k` (k=200 ≈ 1.65% at
  * 99% confidence; error decays ~k^-0.86 — Datasketches published
  * constants), and the guarantees survive arbitrary merge trees, so the
  * shuffle carries fixed-KB sketches instead of per-key value multisets.
  *
  * Unlike every other numeric operator in this repo the sketch is
  * RANDOMIZED (compaction coin flips), so queries must follow the
  * contract-oracle pattern (q_hll_merge, q_heavy_hitters_approx): output
  * exact values plus booleans asserting the published rank-error
  * envelope, never raw estimates.
  */
case class KllSketchAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("kll_sketch_agg k must be foldable")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg requires a bigint column, got ${child.dataType}")
    else if (k < 8 || k > 65535)
      TypeCheckResult.TypeCheckFailure(s"kll_sketch_agg k out of range: $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KllLongsSketch, other: KllLongsSketch): KllLongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** Union of serialized KLL sketches — the rollup side. */
case class KllMergeAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("kll_merge_agg k must be foldable")
    else if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_merge_agg requires a binary sketch column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllLongsSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllLongsSketch, other: KllLongsSketch): KllLongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** `kll_quantile(sketch, rank)` — the rank-`rank` quantile estimate of a
  * serialized KLL sketch (inclusive search criterion, the Datasketches
  * default); null on an empty sketch. CodegenFallback: it only ever runs
  * on per-GROUP aggregate outputs (a handful of rows), never inside a
  * scan projection, so interpreted eval costs nothing measurable. */
case class KllQuantile(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires (binary, double), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"
  override protected def nullSafeEval(sk: Any, rank: Any): Any = {
    val sketch = KllLongsSketch.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else sketch.getQuantile(rank.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

object KllQuantiles {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.catalyst.expressions.Literal

  def sketchAgg(value: Column, k: Int): Column =
    GraftColumnBridge.column(KllSketchAgg(
      GraftColumnBridge.expression(value), Literal(k)).toAggregateExpression())

  def mergeAgg(sketch: Column, k: Int): Column =
    GraftColumnBridge.column(KllMergeAgg(
      GraftColumnBridge.expression(sketch), Literal(k)).toAggregateExpression())

  def quantile(sketch: Column, rank: Double): Column =
    GraftColumnBridge.column(KllQuantile(
      GraftColumnBridge.expression(sketch), Literal(rank)))
}
