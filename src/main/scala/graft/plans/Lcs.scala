package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: longest-common-subsequence LENGTH of two
  * strings (Wagner & Fischer 1974's DP, two-row form) — the global
  * alignment score underneath diff tools and sequence-similarity
  * measures: LCS keeps order but tolerates insertions/deletions on
  * both sides, which neither Jaro–Winkler (transposition-local) nor
  * edit distance (symmetric substitutions) reads the same way.
  *
  * Deterministic and all-integer — character equality only, so both
  * engines (and a window-sweep SQL replay via the prefix-max identity
  * LCS(i,j) = max(LCS(i−1,j), max_{k≤j, a_i=b_k}(LCS(i−1,k−1)+1)))
  * agree exactly. Empty/NULL-free inputs of length 0 return 0.
  *
  * Runs inside WholeStageCodegen as one static call; O(n·m) time,
  * O(min-side) space — built for BOUNDED per-group symbol sequences
  * (spine-bounded daily direction strings), not raw documents.
  */
case class Lcs(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_lcs expects (string, string), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Lcs.length(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.Lcs.length($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lcs =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_lcs"
}

object Lcs {

  /** Two-row Wagner–Fischer LCS length, shared by interpreted eval and
    * codegen. Char-exact on the UTF-16 array (callers use single-char
    * ASCII alphabets).
    */
  def length(a: String, b: String): Long = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0L
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        cur(j) =
          if (a.charAt(i - 1) == b.charAt(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }
}
