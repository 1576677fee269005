package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-heap of the k largest doubles seen — the mergeable state
  * behind `graft_topk`. Deterministic: the k largest VALUES of a multiset
  * are partition- and merge-order-independent (ties are equal values, so
  * which duplicate survives is unobservable in the output).
  */
final class TopKHeap(val k: Int) extends Serializable {
  val heap = new java.util.PriorityQueue[java.lang.Double](math.max(1, k))

  def add(v: Double): Unit =
    if (heap.size < k) { heap.add(v); () }
    else if (v > heap.peek()) { heap.poll(); heap.add(v); () }

  def merge(other: TopKHeap): TopKHeap = {
    val it = other.heap.iterator()
    while (it.hasNext) add(it.next())
    this
  }

  /** Descending top-k values. */
  def sortedDesc: Array[Double] = {
    val a = new Array[Double](heap.size)
    val it = heap.iterator(); var i = 0
    while (it.hasNext) { a(i) = it.next(); i += 1 }
    java.util.Arrays.sort(a)
    a.reverse
  }
}

/** `graft_topk(col, k)` — top-k largest values of a numeric column as a
  * descending ARRAY<DOUBLE>.
  *
  * 100 TB role: the window formulation (`row_number` over a per-group sort)
  * sorts EVERY row of every group; this aggregate keeps O(k) state per
  * group per partition, combines map-side, and ships k doubles per group
  * across the shuffle — the same partial-aggregation shape as sum/count,
  * just with a heap for a buffer. Registered by GraftExtensions.
  */
case class TopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // Fail at analysis time, not inside a task: the update path compares
  // values as doubles, which only makes sense for numeric children.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType if k >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk: k must be >= 1, got $k")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk expects a numeric column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) v match {
      case d: Double => buffer.add(d)
      case f: Float  => buffer.add(f.toDouble)
      case l: Long   => buffer.add(l.toDouble)
      case i: Int    => buffer.add(i.toDouble)
      case s: Short  => buffer.add(s.toDouble)
      case b: Byte   => buffer.add(b.toDouble)
      case d: org.apache.spark.sql.types.Decimal => buffer.add(d.toDouble)
      case other => throw new IllegalStateException(
        s"graft_topk: unexpected value type ${other.getClass} (checkInputDataTypes should have rejected it)")
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = buffer.merge(other)

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc.map(java.lang.Double.valueOf).toArray[Any])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val h = new TopKHeap(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { h.add(in.readDouble()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_topk"
}
