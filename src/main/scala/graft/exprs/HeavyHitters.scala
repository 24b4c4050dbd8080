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

/** SpaceSaving counter set (Metwally et al., ICDT'05): at most `capacity`
  * (item, count, error) entries; an unseen item arriving at a full buffer
  * evicts a minimum-count entry and inherits its count as both floor and
  * error bound.
  *
  * Eviction uses a LAZY MIN-HEAP of (count, item) snapshots: increments
  * push a fresh snapshot instead of updating in place, and [[evictMin]]
  * pops stale snapshots until the head matches the live map — amortized
  * O(log capacity) per eviction instead of an O(capacity) scan, which is
  * what keeps the high-eviction regime (stream cardinality ≫ capacity,
  * the sketch's whole reason to exist) from degenerating quadratic. The
  * heap is rebuilt from the map when stale entries pile past 4×capacity. */
final class SSBuffer(val capacity: Int, ord: Ordering[Any]) {
  val counts = mutable.HashMap.empty[Any, (Long, Long)] // item -> (count, err)
  /** Upper bound on the true count of any item NOT present in this buffer:
    * the largest count ever evicted, plus (after merges) the constituent
    * buffers' floors. Carrying this across the merge is what makes the
    * summary mergeable in the Agarwal et al. (PODS'12) sense — without it,
    * an item evicted in one partial but present in another would lose its
    * evicted-side mass and the `count >= true` guarantee would not survive
    * the cross-partition merge. */
  var floorSum: Long = 0L
  // min at head: smallest count, then smallest item (deterministic victim —
  // it only matters in the approximate regime, but keeps results
  // replay-stable there too)
  private val heapOrd: Ordering[(Long, Any)] = new Ordering[(Long, Any)] {
    def compare(a: (Long, Any), b: (Long, Any)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else ord.compare(a._2, b._2)
    }
  }
  private val heap = mutable.PriorityQueue.empty[(Long, Any)](heapOrd.reverse)

  private def evictMin(): Long = {
    while (true) {
      val (c, item) = heap.dequeue()
      counts.get(item) match {
        case Some((live, _)) if live == c =>
          counts.remove(item)
          if (c > floorSum) floorSum = c
          return c
        case _ => () // stale snapshot; keep popping
      }
    }
    throw new IllegalStateException(
      "SSBuffer invariant violated: heap exhausted without finding a live " +
        "snapshot — every counts entry must have a matching heap snapshot")
  }

  private def push(item: Any, count: Long): Unit = {
    heap.enqueue((count, item))
    if (heap.size > 4 * capacity) { // compact stale snapshots
      heap.clear()
      counts.foreach { case (i, (c, _)) => heap.enqueue((c, i)) }
    }
  }

  def add(item: Any, by: Long = 1L, err: Long = 0L): Unit =
    counts.get(item) match {
      case Some((c, e)) =>
        counts.update(item, (c + by, e + err))
        push(item, c + by)
      case None =>
        if (counts.size < capacity) {
          counts.update(item, (by, err))
          push(item, by)
        } else {
          val m = evictMin()
          counts.update(item, (m + by, m + err))
          push(item, m + by)
        }
    }

  /** Direct load (deserialization): entry plus its heap snapshot. */
  def load(item: Any, count: Long, err: Long): Unit = {
    counts.update(item, (count, err))
    push(item, count)
  }

  /** Floor-carrying merge (Agarwal et al., "Mergeable Summaries", PODS'12):
    * an item present on only one side gets the other side's floor added to
    * both count and error — its true mass in the other side's stream is at
    * most that floor — so `true <= count <= true + error` survives the
    * merge. Exact whenever no constituent ever evicted (both floors zero
    * and the combined distinct set fits `capacity` — the exactness
    * contract); beyond that the smallest tail entries are dropped, which
    * raises only the floor, never a surviving entry's bounds. */
  def merge(other: SSBuffer): Unit = {
    val selfFloor = floorSum
    val otherFloor = other.floorSum
    if (otherFloor > 0) {
      val onlySelf = counts.keysIterator.filterNot(other.counts.contains).toArray
      onlySelf.foreach { item =>
        val (c, e) = counts(item)
        counts.update(item, (c + otherFloor, e + otherFloor))
        push(item, c + otherFloor)
      }
    }
    other.counts.foreach { case (item, (c, e)) =>
      counts.get(item) match {
        case Some((c0, e0)) =>
          counts.update(item, (c0 + c, e0 + e))
          push(item, c0 + c)
        case None => load(item, c + selfFloor, e + selfFloor)
      }
    }
    floorSum = selfFloor + otherFloor
    while (counts.size > capacity) evictMin()
  }

  /** (item, count, err) rows, count desc then item asc — a total order. */
  def top(k: Int): Array[(Any, Long, Long)] =
    counts.iterator.map { case (i, (c, e)) => (i, c, e) }.toArray
      .sortWith((a, b) => if (a._2 != b._2) a._2 > b._2 else ord.compare(a._1, b._1) < 0)
      .take(k)
}

/** `heavy_hitters(item, k, capacity)` — frequent-item aggregate returning
  * `array<struct<item, count, error>>`: the k most frequent items, count
  * descending (item ascending on ties — a total order, so results are
  * hash-stable).
  *
  * CONTRACT: with `distinct(item) ≤ capacity` every count is exact and
  * `error = 0` — the test-scale / oracle regime. Beyond capacity the
  * SpaceSaving guarantees hold END TO END, across the cross-partition
  * merge (floor-carrying merge, Agarwal et al. PODS'12): for every
  * returned item `true ≤ count` and `count − error ≤ true`, and every item
  * with true frequency comfortably above N/capacity survives to the final
  * sketch. `q_heavy_hitters_approx` oracle-checks exactly these
  * inequalities against exact GROUP BY truth at distinct ≫ capacity.
  *
  * The 100-TB shape: one scan pass, `capacity` counters per (key-group,
  * map task) — the shuffle carries bounded sketches instead of one row per
  * distinct item, which is the difference between "top URLs over billions
  * of distinct URLs" being a bounded merge or a full aggregation. For
  * exact small-cardinality top-k, plain groupBy + [[TopKBy]] is the right
  * tool; this is for cardinalities that don't fit.
  */
case class HeavyHitters(
    item: Expression,
    kExpr: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SSBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(item.dataType)
  @transient private lazy val rowProjection =
    UnsafeProjection.create(Array(item.dataType, LongType, LongType))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || !capacityExpr.foldable)
      TypeCheckResult.TypeCheckFailure("heavy_hitters k and capacity must be foldable")
    else if (k <= 0 || capacity < k)
      TypeCheckResult.TypeCheckFailure(s"need 0 < k ≤ capacity, got k=$k capacity=$capacity")
    else TypeUtils.checkForOrderingExpr(item.dataType, prettyName)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", item.dataType),
    StructField("count", LongType, nullable = false),
    StructField("error", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): SSBuffer = new SSBuffer(capacity, ord)

  override def update(buf: SSBuffer, input: InternalRow): SSBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: SSBuffer, other: SSBuffer): SSBuffer = { buf.merge(other); buf }

  override def eval(buf: SSBuffer): Any =
    new GenericArrayData(buf.top(k).map { case (i, c, e) =>
      InternalRow(i, c, e)
    })

  override def serialize(buf: SSBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.floorSum)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (i, (c, e)) =>
      val bytes = rowProjection(InternalRow(i, c, e)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SSBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SSBuffer(capacity, ord)
    buf.floorSum = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(3)
      row.pointTo(rowBytes, len)
      buf.load(InternalRow.copyValue(row.get(0, item.dataType)),
        row.getLong(1), row.getLong(2))
      i += 1
    }
    buf
  }

  override def children: Seq[Expression] = Seq(item, kExpr, capacityExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(item = newChildren(0), kExpr = newChildren(1), capacityExpr = newChildren(2))
  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
}

object HeavyHitters {
  import org.apache.spark.sql.GraftColumnBridge
  import org.apache.spark.sql.catalyst.expressions.Literal

  def heavyHitters(item: Column, k: Int, capacity: Int): Column =
    GraftColumnBridge.column(HeavyHitters(
      GraftColumnBridge.expression(item),
      Literal(k), Literal(capacity)).toAggregateExpression())
}
