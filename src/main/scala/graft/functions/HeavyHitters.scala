package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items ("heavy hitters") summary with k counters.
  *
  * Streaming update: increment a present key; insert if a counter is free;
  * otherwise decrement ALL counters (dropping zeros) — the classic
  * space-bounded frequent-items algorithm. Merge (Agarwal et al., "Mergeable
  * Summaries", PODS'12): sum counters pairwise, then subtract the (k+1)-th
  * largest count and drop non-positives, restoring the size bound.
  *
  * Guarantees after any sequence of updates/merges over n items:
  *   true_count − n/(k+1)  ≤  est  ≤  true_count
  * so every item with true frequency > n/(k+1) is GUARANTEED present.
  * Estimates (not membership) depend on partitioning/merge order, hence
  * property-checked (HeavyHittersSpec), not DuckDB-hash-declared — the same
  * status as C05's HLL.
  *
  * 100 TB role: top-token / hot-key discovery in one pass with O(k) state
  * per partition and O(k) shuffle bytes total, instead of a full
  * (token → count) shuffle over the corpus. Also the skew detector feeding
  * the salted-join path (Joins.saltedJoin).
  */
final class MgSketch(val k: Int) extends Serializable {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var n: Long = 0L // items observed (for the error bound)

  def add(item: String): Unit = {
    n += 1
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        // Decrement-all step; drop zeros.
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(counts.remove)
    }
  }

  def merge(other: MgSketch): MgSketch = {
    n += other.n
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k) {
      // Subtract the (k+1)-th largest count, drop non-positives.
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val sub = sorted(sorted.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - sub)
      counts.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(counts.remove)
    }
    this
  }

  /** (item, estimate) pairs, count-desc then item-asc — deterministic given
    * the final counter state.
    */
  def top: Seq[(String, Long)] =
    counts.toSeq.sortBy { case (item, c) => (-c, item) }
}

/** `graft_heavy_hitters(col, k)` — Misra–Gries sketch over a string column;
  * returns ARRAY<STRUCT<item STRING, est BIGINT>> sorted by est desc.
  * Registered by GraftExtensions alongside graft_kmv_distinct.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MgSketch = new MgSketch(k)

  override def update(buffer: MgSketch, input: InternalRow): MgSketch = {
    val v = child.eval(input)
    // UTF8String may alias a reused row buffer — materialize to String.
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: MgSketch, other: MgSketch): MgSketch = buffer.merge(other)

  override def eval(buffer: MgSketch): Any =
    new GenericArrayData(buffer.top.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.toArray[Any])

  override def serialize(buffer: MgSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeLong(buffer.n)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sketch = new MgSketch(in.readInt())
    sketch.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      sketch.counts.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    sketch
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_heavy_hitters"
}
