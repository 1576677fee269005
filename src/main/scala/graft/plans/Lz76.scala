package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Lempel–Ziv 1976 production complexity of a
  * string — the number of phrases in the exhaustive-history parsing
  * (Lempel & Ziv, IEEE IT 1976; the c(n) of Kaspar & Schuster 1987).
  *
  * Exact semantics (phrase form, equivalent to the KS state machine):
  * scan left to right; each new phrase is the LONGEST prefix of the
  * remaining text that already occurs starting at some earlier position
  * (the source may overlap the phrase itself — the self-reproducing
  * copy LZ76 allows), extended by one innovation character; the final
  * phrase may end without an innovation. The complexity is the phrase
  * count: low for periodic/self-similar strings (c("aaaa…") = 2), high
  * (~n/log n) for incompressible ones. Empty/NULL-free input of length
  * 0 returns 0.
  *
  * Deterministic and all-integer — character equality only, no floats,
  * so both engines (and a recursive-CTE SQL replay) agree exactly.
  *
  * Runs inside WholeStageCodegen as one static call. The scan is
  * O(n²·L̄) character compares with zero allocation beyond the codepoint
  * array — built for BOUNDED per-group symbol sequences (daily
  * up/down/flat strings, journey alphabets), not raw documents; callers
  * cap the series length by construction (spine-bounded grids).
  */
case class Lz76(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lz76 expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Lz76.complexity(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Lz76.complexity($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Lz76 =
    copy(child = newChild)

  override def prettyName: String = "graft_lz76"
}

object Lz76 {

  /** Static parser shared by interpreted eval and codegen: number of
    * phrases in the exhaustive-history LZ76 parsing. Codepoint-exact
    * (works on the UTF-16 char array — callers use single-char ASCII
    * alphabets; any consistent unit gives a consistent count).
    */
  def complexity(s: String): Long = {
    val n = s.length
    if (n == 0) return 0L
    var pos = 0
    var c = 0L
    while (pos < n) {
      // longest l with an earlier occurrence q < pos of s[pos, pos+l)
      // (source run may overlap past pos — LZ76's self-reproduction)
      var l = 0
      var extending = true
      while (extending && l < n - pos) {
        val cand = l + 1
        var found = false
        var q = 0
        while (!found && q < pos) {
          var t = 0
          var eq = true
          while (eq && t < cand) {
            if (s.charAt(q + t) != s.charAt(pos + t)) eq = false
            t += 1
          }
          if (eq) found = true
          q += 1
        }
        if (found) l = cand else extending = false
      }
      val phrase = math.min(l + 1, n - pos)
      c += 1L
      pos += phrase
    }
    c
  }
}
