package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the md5-hash 32-bit value of
  * [[graft.operators.NearDup.hexValueExpr]] — Σ over the first eight
  * characters of `(hex digit value − 0, or −1 when not a lowercase hex
  * digit) · 16^(8−d)` — as ONE codegen'd call instead of the 8-term
  * `instr('0123456789abcdef', substring(h, d, 1)) − 1` chain.
  *
  * Why: every md5-derandomized draw in the engine (MinHash permutations,
  * SRP cap order, DOULION edge sampling, bootstrap/permutation picks,
  * holdout buckets) evaluates that chain per row of a hot relation; the
  * chain costs 8 substring allocations + 8 needle scans per row. This
  * expression computes the identical value in one pass over ≤ 8 bytes.
  *
  * Exact-equivalence contract with the portable chain (pinned by
  * Hex32Spec for every edge case, not just md5 outputs):
  *  - NULL input → NULL (the chain's NULL substring nulls every term);
  *  - characters past the string's end contribute 0 (substring returns
  *    '' and instr(h, '') = 1, so the term is (1−1)·scale = 0);
  *  - a character outside [0-9a-f] (uppercase included — instr is
  *    case-sensitive) contributes −1·scale, exactly like instr's 0.
  *
  * The oracle text keeps the portable instr/substring form — DuckDB
  * evaluates the same formula, so cross-engine values are unchanged.
  */
case class Hex32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hex32 expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Hex32.value(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hex32.value($c)")

  override protected def withNewChildInternal(newChild: Expression): Hex32 =
    copy(child = newChild)

  override def prettyName: String = "graft_hex32"
}

object Hex32 {

  /** Static evaluator shared by interpreted eval and codegen. */
  def value(s: UTF8String): Long = {
    val nBytes = s.numBytes()
    val m = math.min(8, nBytes)
    // Fast path: the examined prefix is pure ASCII (every md5 hex string
    // is), so byte index == character index. A non-ASCII lead byte in
    // the prefix falls back to the character-exact path.
    var ascii = true
    var i = 0
    while (ascii && i < m) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) {
      var sum = 0L
      var d = 0
      while (d < m) {
        sum += digit(s.getByte(d).toChar) << (4 * (7 - d))
        d += 1
      }
      sum
    } else {
      // Slow path (non-ASCII prefix): iterate CODEPOINTS, because
      // substring(h, d, 1) — the chain's digit extractor — is
      // codepoint-indexed, not UTF-16-unit-indexed.
      val str = s.toString
      var sum = 0L
      var d = 0
      var i = 0
      while (d < 8 && i < str.length) {
        val cp = str.codePointAt(i)
        val dv =
          if (cp >= '0' && cp <= '9') (cp - '0').toLong
          else if (cp >= 'a' && cp <= 'f') (cp - 'a' + 10).toLong
          else -1L
        sum += dv << (4 * (7 - d))
        i += java.lang.Character.charCount(cp)
        d += 1
      }
      sum
    }
  }

  /** Hex digit value of c, or −1 when c is not a lowercase hex digit —
    * exactly instr('0123456789abcdef', c) − 1.
    */
  private def digit(c: Char): Long =
    if (c >= '0' && c <= '9') (c - '0').toLong
    else if (c >= 'a' && c <= 'f') (c - 'a' + 10).toLong
    else -1L
}
