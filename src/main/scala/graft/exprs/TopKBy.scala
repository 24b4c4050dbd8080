package graft.exprs

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded per-key top-k buffer: keeps the k LARGEST sort keys seen, with
  * their payloads. Heap head is the smallest kept item, so each insert
  * against a full buffer is one compare + O(log k) on acceptance. */
final class TopKBuffer(val k: Int, ord: Ordering[Any]) {
  // head = smallest kept (reverse ordering: PriorityQueue dequeues its max)
  val heap: mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty[(Any, Any)](Ordering.by[(Any, Any), Any](_._1)(ord).reverse)

  def insert(key: Any, payload: Any): Unit = {
    if (heap.size < k) heap.enqueue((key, payload))
    else if (ord.compare(key, heap.head._1) > 0) { heap.dequeue(); heap.enqueue((key, payload)) }
  }

  /** Kept items, best (largest under `ord`) sort key first. */
  def sortedDesc: Array[(Any, Any)] =
    heap.toArray.sortWith((a, b) => ord.compare(a._1, b._1) > 0)
}

/** `top_k_by(sort_key, payload, k)` — aggregate returning the payloads of
  * the k rows with the LARGEST sort keys, as `array<payload>` ordered
  * largest-first. The sort key may be any orderable type; pass a struct for
  * compound orderings (struct comparison is field-by-field, so
  * `struct(price, -order_id)` means price desc then order_id asc once the
  * array is read largest-first). For a hash-stable result the sort key must
  * be a TOTAL order over the group's rows — equal keys keep an arbitrary
  * payload.
  *
  * This is the scale path for "top N per group": a window-rank plan
  * (`row_number() OVER (PARTITION BY ...) <= k`) shuffles EVERY row to its
  * key's partition and sorts the whole partition; this aggregate keeps a
  * k-item heap per key on the map side (ObjectHashAggregate partial), so
  * the shuffle carries at most k rows per (key, map task) and nothing is
  * ever globally sorted. At 100 TB with hot keys that is the difference
  * between a skew-bound sort and a bounded merge. Rows with a NULL sort key
  * are ignored (SQL max/min semantics).
  */
case class TopKBy(
    sortKey: Expression,
    payload: Expression,
    kExpr: Expression,
    reverse: Boolean = false, // true = keep the k SMALLEST, smallest first
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val ord: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(sortKey.dataType)
    if (reverse) base.reverse else base
  }
  @transient private lazy val pairProjection =
    UnsafeProjection.create(Array(sortKey.dataType, payload.dataType))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("top_k_by k must be a foldable integer")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"top_k_by k must be positive, got $k")
    else TypeUtils.checkForOrderingExpr(sortKey.dataType, prettyName)

  override def dataType: DataType = ArrayType(payload.dataType, payload.nullable)
  override def nullable: Boolean = false
  override def prettyName: String = if (reverse) "bottom_k_by" else "top_k_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ord)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val key = sortKey.eval(input)
    if (key != null) {
      // copy: evaluated values may be views into a reused input row
      buf.insert(InternalRow.copyValue(key), InternalRow.copyValue(payload.eval(input)))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (key, value) => buf.insert(key, value) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map(_._2))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (key, value) =>
      val bytes = pairProjection(InternalRow(key, value)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k, ord)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      buf.insert(InternalRow.copyValue(row.get(0, sortKey.dataType)),
                 InternalRow.copyValue(row.get(1, payload.dataType)))
      i += 1
    }
    buf
  }

  override def children: Seq[Expression] = Seq(sortKey, payload, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(sortKey = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
}

object TopKBy {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: `topKBy(sortKey, payload, k)` → `array<payload>`,
    * largest sort key first. */
  def topKBy(sortKey: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(TopKBy(
      GraftColumnBridge.expression(sortKey),
      GraftColumnBridge.expression(payload),
      org.apache.spark.sql.catalyst.expressions.Literal(k)).toAggregateExpression())

  /** `bottomKBy(sortKey, payload, k)` → the k SMALLEST, smallest first —
    * for ascending orderings over types that can't be negated (hex-string
    * hash draws, timestamps). */
  def bottomKBy(sortKey: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(TopKBy(
      GraftColumnBridge.expression(sortKey),
      GraftColumnBridge.expression(payload),
      org.apache.spark.sql.catalyst.expressions.Literal(k),
      reverse = true).toAggregateExpression())
}
