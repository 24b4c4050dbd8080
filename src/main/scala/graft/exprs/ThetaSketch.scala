package graft.exprs

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Theta sketches (Datasketches; Dasgupta/Lang/Rhodes, "A
  * framework for estimating stream expression cardinalities") — the FOURTH
  * mergeable-sketch family here beside HLL, SpaceSaving and KLL, and the
  * one that closes the set-ALGEBRA gap: HLL unions but cannot intersect or
  * difference, while Theta sketches support union / intersection / A-not-B
  * over their retained-hash samples, which is exactly the
  * audience-overlap / segment-arithmetic workload ("users who did A but
  * not B", "overlap of cohorts X and Y") that otherwise needs a full
  * distinct self-join per question.
  *
  * `theta_sketch_agg(col, nomEntries)` builds a per-group sketch
  * (BinaryType, portable Datasketches wire format);
  * `theta_merge_agg(sketchCol, nomEntries)` unions serialized sketches
  * (the rollup side); [[ThetaSketch.union]]/[[ThetaSketch.intersect]]/
  * [[ThetaSketch.aNotB]] combine two serialized sketches scalar-wise and
  * [[ThetaSketch.estimate]] reads the cardinality out.
  *
  * CONTRACT (the q_hll_merge pattern): with distinct ≤ nominalEntries the
  * sketch never samples — every estimate, including through any chain of
  * set operations, is EXACT, which is the regime the oracle hash-checks.
  * Beyond that the published relative-error bounds hold for union
  * (~1/√nom); intersection/A-not-B error scales with the inclusion ratio
  * (Datasketches documented behavior) — the ThetaSpec exercises the
  * estimation regime against those envelopes.
  *
  * 100 TB shape: per (group, map task) state is the fixed nominal-entries
  * hash sample regardless of stream cardinality; the shuffle carries
  * bounded sketches, and set questions over ANY pair of precomputed
  * segment sketches are answered without rescanning raw data.
  */
case class ThetaSketchAgg(
    child: Expression,
    nomExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  private lazy val nom: Int = nomExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (!nomExpr.foldable)
      TypeCheckResult.TypeCheckFailure("theta_sketch_agg nominalEntries must be foldable")
    else if (child.dataType != LongType && child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"theta_sketch_agg requires bigint or string, got ${child.dataType}")
    else if (nom < 16 || nom > (1 << 26) || (nom & (nom - 1)) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"theta_sketch_agg nominalEntries must be a power of two in [16, 2^26]: $nom")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nom).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buf.update(l.longValue())
      case s: UTF8String => buf.update(s.toString)
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult()); buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(nom).buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def children: Seq[Expression] = Seq(child, nomExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren(0), nomExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** Union of serialized Theta sketches — the rollup side. */
case class ThetaMergeAgg(
    child: Expression,
    nomExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  private lazy val nom: Int = nomExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (!nomExpr.foldable)
      TypeCheckResult.TypeCheckFailure("theta_merge_agg nominalEntries must be foldable")
    else if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"theta_merge_agg requires a binary sketch column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_merge_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nom).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketches.heapifySketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult()); buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(nom).buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def children: Seq[Expression] = Seq(child, nomExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaMergeAgg =
    copy(child = newChildren(0), nomExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** `theta_<op>(a, b)` — set operation over two serialized sketches.
  * CodegenFallback: set ops only ever run on per-group aggregate outputs
  * (a handful of rows), never inside a scan projection. */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  require(op == "union" || op == "intersect" || op == "anotb", s"bad op $op")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_$op requires (binary, binary), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = s"theta_$op"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Sketches.heapifySketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = Sketches.heapifySketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val out = op match {
      case "union" =>
        SetOperation.builder().buildUnion().union(sa, sb)
      case "intersect" =>
        SetOperation.builder().buildIntersection().intersect(sa, sb)
      case "anotb" =>
        SetOperation.builder().buildANotB().aNotB(sa, sb)
    }
    out.toByteArray
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)
}

/** `theta_estimate(sketch)` — cardinality estimate rounded to long (EXACT
  * whenever the sketch chain never entered estimation mode). */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires binary, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(a: Any): Any =
    math.round(Sketches.heapifySketch(
      Memory.wrap(a.asInstanceOf[Array[Byte]])).getEstimate)
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

object ThetaSketch {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.catalyst.expressions.Literal

  def sketchAgg(value: Column, nominalEntries: Int): Column =
    GraftColumnBridge.column(ThetaSketchAgg(
      GraftColumnBridge.expression(value),
      Literal(nominalEntries)).toAggregateExpression())

  def mergeAgg(sketch: Column, nominalEntries: Int): Column =
    GraftColumnBridge.column(ThetaMergeAgg(
      GraftColumnBridge.expression(sketch),
      Literal(nominalEntries)).toAggregateExpression())

  def union(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaSetOp(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), "union"))

  def intersect(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaSetOp(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), "intersect"))

  def aNotB(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaSetOp(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), "anotb"))

  def estimate(sketch: Column): Column =
    GraftColumnBridge.column(ThetaEstimate(GraftColumnBridge.expression(sketch)))
}
