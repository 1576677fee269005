package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) — the
  * point-frequency member of the sketch-column family beside
  * [[KmvSketch]] (distinct counts), [[KllState]] (quantiles),
  * [[MgSketch]] (top items), and [[TopK]] (extremes). Where Misra–Gries
  * keeps only the k heaviest keys, CMS answers a frequency query for ANY
  * key after the fact — the "how often did THIS url/token/user appear"
  * question over state that never stored the key itself.
  *
  * State: a depth × width matrix of int64 counters. Update hashes the
  * item once per row with an odd-multiplier mix of a 64-bit base hash
  * and increments one counter per row; the estimate is the row-wise
  * minimum. Guarantees after any updates/merges totalling n items:
  *   true ≤ est ≤ true + (e/width)·n  with probability 1 − e^(−depth).
  * One-sided error — CMS never undercounts — which the property spec
  * pins exactly. Merge is elementwise counter addition (dimensions must
  * match), so estimates are INDEPENDENT of partitioning and merge order:
  * unlike KLL, a CMS plan re-shuffle can never move an answer.
  *
  * 100 TB role: per-partition state is a fixed depth·width block of
  * longs regardless of key cardinality — a billion-key frequency table
  * that would need a corpus-wide shuffle collapses to O(groups) sketch
  * bytes, rolled up later with `graft_cms_merge` (same shape as the KMV
  * telemetry argument). Hash mixing is a pure function of the item
  * bytes, so sketches built on different executors/JVMs agree
  * byte-for-byte.
  */
final class CmsState(val depth: Int, val width: Int) extends Serializable {
  require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
  require(width >= 8, s"width >= 8, got $width")

  val counts: Array[Long] = new Array[Long](depth * width)
  var n: Long = 0L

  /** 64-bit avalanche of the item's UTF-8 bytes (FNV-1a core + final
    * mix) — deterministic across JVMs, no RNG anywhere. */
  private def baseHash(item: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = item.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    // fmix64 (MurmurHash3 finalizer) to break FNV's weak low bits
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  private def slot(base: Long, row: Int): Int = {
    // per-row odd-multiplier remix; floorMod keeps the index positive
    val h = (base + 0x9e3779b97f4a7c15L * (row + 1)) * 0xbf58476d1ce4e5b9L
    java.lang.Math.floorMod(h ^ (h >>> 31), width.toLong).toInt
  }

  def add(item: String, by: Long = 1L): Unit = {
    val base = baseHash(item)
    var r = 0
    while (r < depth) { counts(r * width + slot(base, r)) += by; r += 1 }
    n += by
  }

  def estimate(item: String): Long = {
    val base = baseHash(item)
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + slot(base, r))
      if (c < min) min = c
      r += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  def merge(other: CmsState): CmsState = {
    require(other.depth == depth && other.width == width,
      s"CMS dimension mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    n += other.n
    this
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(depth); out.writeInt(width); out.writeLong(n)
    var i = 0
    while (i < counts.length) { out.writeLong(counts(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object CmsState {
  def deserialize(bytes: Array[Byte]): CmsState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new CmsState(in.readInt(), in.readInt())
    s.n = in.readLong()
    var i = 0
    while (i < s.counts.length) { s.counts(i) = in.readLong(); i += 1 }
    s
  }
}

/** `graft_cms_sketch(col, depth, width)` — Count-Min sketch of a string
  * column as binary. */
case class CmsBuildAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CmsState = new CmsState(depth, width)

  override def update(buffer: CmsState, input: InternalRow): CmsState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: CmsState, other: CmsState): CmsState =
    buffer.merge(other)

  override def eval(buffer: CmsState): Any = buffer.serialize()
  override def serialize(buffer: CmsState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsState =
    CmsState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsBuildAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_cms_sketch"
}

/** `graft_cms_merge(sketch)` — elementwise rollup of already-built CMS
  * binaries; dimensions are taken from the first non-null input and must
  * agree (a mismatch is a hard error — silently mixing geometries would
  * corrupt counts). */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CmsState]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Option[CmsState] = None

  override def update(buffer: Option[CmsState], input: InternalRow): Option[CmsState] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = CmsState.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case Some(s) => Some(s.merge(incoming))
        case None    => Some(incoming)
      }
    }
  }

  override def merge(buffer: Option[CmsState], other: Option[CmsState]): Option[CmsState] =
    (buffer, other) match {
      case (Some(a), Some(b)) => Some(a.merge(b))
      case (Some(a), None)    => Some(a)
      case (None, b)          => b
    }

  override def eval(buffer: Option[CmsState]): Any =
    buffer.map(_.serialize()).orNull

  override def serialize(buffer: Option[CmsState]): Array[Byte] =
    buffer.map(_.serialize()).getOrElse(Array.emptyByteArray)

  override def deserialize(bytes: Array[Byte]): Option[CmsState] =
    if (bytes.isEmpty) None else Some(CmsState.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_cms_merge"
}

/** `graft_cms_query(sketch, item)` — frequency estimate for one item;
  * NULL when the sketch is NULL. */
case class CmsQueryExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsState.deserialize(sketch.asInstanceOf[Array[Byte]])
      .estimate(item.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQueryExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cms_query"
}

/** `graft_cms_n(sketch)` — exact total update count folded into a CMS. */
case class CmsCountExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullSafeEval(sketch: Any): Any =
    CmsState.deserialize(sketch.asInstanceOf[Array[Byte]]).n
  override protected def withNewChildInternal(
      newChild: Expression): CmsCountExpr = copy(child = newChild)
  override def prettyName: String = "graft_cms_n"
}
