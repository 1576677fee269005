package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** KMV sketch COLUMNS (SURVEY.md §2.4 sketch family, the multiset-algebra
  * layer of [[KmvDistinct]], per Beyer et al. SIGMOD 2007):
  *
  *  - `graft_kmv_sketch(col, k)`   → binary  (aggregate: build a sketch)
  *  - `graft_kmv_merge(sketch, k)` → binary  (aggregate: union sketches)
  *  - `graft_kmv_estimate(sketch)` → bigint  (scalar: distinct estimate)
  *  - `graft_kmv_union(a, b)`      → bigint  (scalar: |A ∪ B| estimate)
  *  - `graft_kmv_intersect(a, b)`  → bigint  (scalar: |A ∩ B| estimate)
  *  - `graft_kmv_jaccard(a, b)`    → double  (scalar: J(A,B) estimate)
  *
  * Why this shape matters at 100 TB: the expensive pass over raw data
  * happens ONCE (per partition / day / source), producing k·8-byte binary
  * state that persists in ordinary tables; every later rollup or
  * cross-group set question re-aggregates the sketches associatively —
  * cost proportional to group count, not data size. Deterministic
  * throughout (pure function of the input set), so retries and merge
  * order cannot move a gated result.
  *
  * The scalar ops are CodegenFallback by design: they run once per GROUP
  * on k-bounded state, not per input row — codegen would buy nothing
  * (contrast with the per-row `graft_dot`/`graft_bloom_might_contain`,
  * which are full codegen expressions).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(k)

  override def update(buffer: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(KmvHash.hash(v))
    buffer
  }

  override def merge(buffer: KmvSketch, other: KmvSketch): KmvSketch = buffer.merge(other)
  override def eval(buffer: KmvSketch): Any = KmvSketch.toBytes(buffer)
  override def serialize(buffer: KmvSketch): Array[Byte] = KmvSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): KmvSketch = KmvSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_kmv_sketch"
}

/** Re-aggregation of already-built sketches (binary column → binary):
  * the rollup step of the sketch-column pattern.
  */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(k)

  // Both paths clamp the effective k to the smallest seen (see
  // KmvSketch.mergeClamped): a k=128 input sketch merged under
  // graft_kmv_merge(sk, 256) must yield a k=128 result, not a 256-slot
  // buffer that never fills and estimates "exactly".
  override def update(buffer: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null)
      KmvSketch.mergeClamped(buffer, KmvSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    else buffer
  }

  override def merge(buffer: KmvSketch, other: KmvSketch): KmvSketch =
    KmvSketch.mergeClamped(buffer, other)
  override def eval(buffer: KmvSketch): Any = KmvSketch.toBytes(buffer)
  override def serialize(buffer: KmvSketch): Array[Byte] = KmvSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): KmvSketch = KmvSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_kmv_merge"
}

case class KmvEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    KmvSketch.fromBytes(input.asInstanceOf[Array[Byte]]).estimate
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
  override def prettyName: String = "graft_kmv_estimate"
}

case class KmvUnionEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.unionEstimate(
      KmvSketch.fromBytes(a.asInstanceOf[Array[Byte]]),
      KmvSketch.fromBytes(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvUnionEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kmv_union"
}

case class KmvIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersectionEstimate(
      KmvSketch.fromBytes(a.asInstanceOf[Array[Byte]]),
      KmvSketch.fromBytes(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvIntersectEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kmv_intersect"
}

case class KmvJaccardEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.jaccardEstimate(
      KmvSketch.fromBytes(a.asInstanceOf[Array[Byte]]),
      KmvSketch.fromBytes(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvJaccardEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kmv_jaccard"
}
