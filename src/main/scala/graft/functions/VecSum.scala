package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable element-wise sum state: a double vector sized by the first
  * array seen. Length mismatches fail LOUDLY (they mean the caller's
  * per-row arrays disagree — silent truncation would corrupt moments).
  */
final class VecSumState extends Serializable {
  var sums: Array[Double] = null

  def add(a: ArrayData, isFloat: Boolean): Unit = {
    val n = a.numElements()
    if (sums == null) sums = new Array[Double](n)
    else require(sums.length == n,
      s"graft_vec_sum: array length changed mid-group (${sums.length} vs $n)")
    var i = 0
    while (i < n) {
      // NULL elements fail LOUDLY (ADVICE r13): getDouble on a null slot
      // is undefined (garbage on unsafe rows, NPE on generic ones), and
      // silently treating it as 0.0 would diverge from the explode+SUM
      // formulation this aggregate replaces. The declared callers build
      // dense non-null arrays; anything else is a caller bug.
      require(!a.isNullAt(i),
        s"graft_vec_sum: NULL element at position $i — input arrays must be dense")
      sums(i) += (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      i += 1
    }
  }

  def merge(other: VecSumState): VecSumState = {
    if (other.sums != null) {
      if (sums == null) sums = other.sums
      else {
        require(sums.length == other.sums.length,
          s"graft_vec_sum: merge length mismatch (${sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
      }
    }
    this
  }
}

/** `graft_vec_sum(arr)` — element-wise sum of equal-length double/float
  * arrays as ARRAY<DOUBLE>; NULL rows are skipped, an all-NULL group
  * yields NULL (the SUM convention), and a NULL ELEMENT inside a non-null
  * array throws (dense-array contract — ADVICE r13).
  *
  * 100 TB role (r13): per-group dense-moment passes (Q321's d(d+1)/2
  * covariance upper triangle) previously EXPLODED one row per cell per
  * input row — n·d²/2 struct rows through a hash aggregate. This
  * aggregate keeps ONE double vector per group per partition, combines
  * map-side, and ships d(d+1)/2 doubles per group across the shuffle —
  * the same partial-aggregation shape as sum/count applied to a vector.
  * Numerically it is a partition-parallel double sum of the identical
  * terms, the same accumulation class as the hash aggregate it replaces
  * (neither pins a global order; consumers round per the Q137 rule).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_sum expects array<double>/array<float>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): VecSumState = new VecSumState

  override def update(buffer: VecSumState, input: InternalRow): VecSumState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData], isFloat)
    buffer
  }

  override def merge(buffer: VecSumState, other: VecSumState): VecSumState =
    buffer.merge(other)

  override def eval(buffer: VecSumState): Any =
    if (buffer.sums == null) null
    else new GenericArrayData(buffer.sums.map(java.lang.Double.valueOf).toArray[Any])

  override def serialize(buffer: VecSumState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val n = if (buffer.sums == null) -1 else buffer.sums.length
    out.writeInt(n)
    var i = 0
    while (i < math.max(0, n)) { out.writeDouble(buffer.sums(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new VecSumState
    val n = in.readInt()
    if (n >= 0) {
      st.sums = new Array[Double](n)
      var i = 0
      while (i < n) { st.sums(i) = in.readDouble(); i += 1 }
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_vec_sum"
}
