package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a serialized Bloom filter — the
  * codegen'd replacement for the Scala-UDF prefilter in
  * `Joins.bloomSemiJoin` (same pattern as [[DotProduct]]: a tight
  * branch inside WholeStageCodegen instead of a codegen-opaque UDF that
  * boxes every key and breaks stage fusion).
  *
  * The filter travels as constructor state (not a child expression), so
  * it is serialized once with the plan and shipped through the
  * task-binary broadcast; each executor deserializes it once via the
  * transient lazy val, never per row. Probe semantics match how
  * `DataFrame.stat.bloomFilter` inserted the keys: integral keys via
  * `mightContainLong`, strings via their UTF-8 bytes (`putString` and
  * `putBinary(utf8 bytes)` hash identically in the sketch library).
  *
  * NULL keys yield NULL (standard unary-expression null propagation),
  * which a Filter treats as reject — exactly the prior UDF's
  * `k != null && …` behavior, and correct for a semi-join prefilter.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain: unsupported key type ${other.simpleString} " +
        "(stat.bloomFilter hashes integral and string keys)")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  /** Executor-side accessor for the generated code's init block. */
  def deserializedFilter(): BloomFilter = filter

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType  => filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case IntegerType => filter.mightContainLong(v.asInstanceOf[Int].toLong)
    case LongType    => filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val exprCls = classOf[BloomMightContain].getName
    val exprRef = ctx.addReferenceObj("graftBloomExpr", this, exprCls)
    val filterTerm = ctx.addMutableState(bloomCls, "graftBloomFilter",
      v => s"$v = (($exprCls) $exprRef).deserializedFilter();")
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType  => s"${ev.value} = $filterTerm.mightContainBinary($c.getBytes());"
      case IntegerType => s"${ev.value} = $filterTerm.mightContainLong((long) $c);"
      case LongType    => s"${ev.value} = $filterTerm.mightContainLong($c);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}
