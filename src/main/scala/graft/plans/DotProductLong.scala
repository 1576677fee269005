package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared base of the exact-int64 array folds ([[DotProductLong]] /
  * [[SqDistLong]]): Σ f(xᵢ, yᵢ) over two bigint/int arrays as one tight
  * codegen'd primitive loop — no per-row zipped-array allocation, no
  * lambda dispatch.
  *
  * Why: the integer-grid similarity family (Q198/Q248/Q302/Q322/Q346/
  * Q347) evaluates its exact dot products and squared distances on the
  * CANDIDATE PAIR relation — millions of rows × 64-element arrays — via
  * `aggregate(zip_with(x, y, λ), 0L, +)`, which materializes a 64-element
  * intermediate array and evaluates two lambdas per element PER PAIR.
  * This expression computes the identical exact int64 value in a loop.
  *
  * Exactness contract (mirrors the HOF fold bit-for-bit):
  *  - lengths differ → NULL (zip_with pads the short side with NULL, the
  *    null product nulls the running Add, and a null fold stays null);
  *  - any NULL element pair → NULL (same propagation);
  *  - arithmetic is Math.multiplyExact/addExact, so an int64 overflow
  *    throws loudly — the same failure class as the ANSI-mode Multiply/
  *    Add the lambda fold would raise (message differs, loudness equal).
  *    One divergence, documented: the HOF form materializes EVERY product
  *    before folding, so it can throw on an overflow past a NULL element;
  *    the loop returns NULL at the first null pair without evaluating
  *    later products. Unreachable for the declared queries (their arrays
  *    are dense 64-dim grids with declared magnitude fences).
  */
abstract class LongArrayFold extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>/array<int> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  protected def elemIsInt(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  /** Exact per-element term; overflow must throw (multiplyExact class). */
  protected def term(a: Long, b: Long): Long

  /** Java statements computing the per-element term into `long t`. */
  protected def termCode(a: String, b: String, t: String): String

  override def nullSafeEval(x: Any, y: Any): Any = {
    val a = x.asInstanceOf[ArrayData]
    val b = y.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val ai = elemIsInt(left); val bi = elemIsInt(right)
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val av = if (ai) a.getInt(i).toLong else a.getLong(i)
      val bv = if (bi) b.getInt(i).toLong else b.getLong(i)
      s = Math.addExact(s, term(av, bv))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsInt(left)) "getInt" else "getLong"
    val bGet = if (elemIsInt(right)) "getInt" else "getLong"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      val t = ctx.freshName("t")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $av = (long) $a.$aGet($i);
         |    long $bv = (long) $b.$bGet($i);
         |    ${termCode(av, bv, t)}
         |    $acc = java.lang.Math.addExact($acc, $t);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
}

/** Σ xᵢ·yᵢ exact int64 — the integer-grid dot product. */
case class DotProductLong(left: Expression, right: Expression)
    extends LongArrayFold {
  override protected def term(a: Long, b: Long): Long = Math.multiplyExact(a, b)
  override protected def termCode(a: String, b: String, t: String): String =
    s"long $t = java.lang.Math.multiplyExact($a, $b);"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_long"
}

/** Σ (xᵢ−yᵢ)² exact int64 — the integer-grid squared L2 distance. */
case class SqDistLong(left: Expression, right: Expression)
    extends LongArrayFold {
  override protected def term(a: Long, b: Long): Long = {
    val d = Math.subtractExact(a, b)
    Math.multiplyExact(d, d)
  }
  override protected def termCode(a: String, b: String, t: String): String =
    s"long ${t}d = java.lang.Math.subtractExact($a, $b); " +
      s"long $t = java.lang.Math.multiplyExact(${t}d, ${t}d);"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sqdist_long"
}
