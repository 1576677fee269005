package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity of two strings —
  * the record-linkage scorer (Winkler 1990, after Jaro 1989) the fuzzy
  * entity-resolution family (Q94/Q126's edit-distance) lacks: edit
  * distance counts operations, JW rewards shared prefixes and tolerates
  * transpositions, which is what name/title matching wants.
  *
  * Exact semantics (mirrors the textbook definition, verified against
  * DuckDB's `jaro_winkler_similarity` on the classic Winkler test pairs
  * — MARTHA/MARHTA 0.9611, DIXON/DICKSONX 0.8133, DWAYNE/DUANE 0.84):
  *  - match window = max(|a|,|b|)/2 − 1 (integer floor, min 0);
  *  - transpositions = half the out-of-order matched characters;
  *  - jaro = (m/|a| + m/|b| + (m−t)/m)/3, 0 when m = 0 (so any empty
  *    side scores 0, including both-empty — DuckDB's convention);
  *  - Winkler boost only when jaro > 0.7: jw = jaro + ℓ·0.1·(1−jaro)
  *    with ℓ = common prefix length capped at 4.
  *
  * Runs inside WholeStageCodegen as a single static call (the scratch
  * match-flag arrays live in the helper; O(|a|·|b|) worst-case per row,
  * O(16·|a|) typical with the window bound — fine for name-length
  * strings; block long-text comparisons before scoring, as Q218 does).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any, y: Any): Any =
    JaroWinkler.similarity(
      x.asInstanceOf[UTF8String].toString,
      y.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

object JaroWinkler {

  /** Static scorer shared by interpreted eval and codegen. */
  def similarity(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk matched chars of both sides in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
