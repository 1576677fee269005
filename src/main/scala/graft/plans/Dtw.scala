package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: banded dynamic-time-warping distance of
  * two int64 series (Sakoe & Chiba 1978's slope-constrained DP over
  * Berndt & Clifford 1994's DTW formulation) — the alignment-tolerant
  * series distance the event-time family lacks: L1/L2 compare day i to
  * day i, DTW lets a pattern that runs a few days late still match, at
  * a cost the warping path makes explicit.
  *
  * Exact semantics:
  *  - cost c(i,j) = |a(i) − b(j)|, path moves (i−1,j), (i,j−1),
  *    (i−1,j−1), start (0,0), end (n−1,m−1);
  *  - Sakoe–Chiba band |i − j| ≤ w: cells outside the band are
  *    unreachable (the classical speed/overfit control — and what makes
  *    the cost O(n·w) instead of O(n·m));
  *  - all-integer arithmetic — inputs are int64, so the distance is
  *    exact and engine-independent (no float accumulation anywhere);
  *  - empty input or |n − m| > w (end cell outside any banded path)
  *    returns −1 (callers treat as "not comparable").
  *
  * Runs inside WholeStageCodegen as a single static call; the two
  * rolling DP rows are O(m) scratch per call. Designed for
  * GROUPED bounded series (daily grids, per-entity traces) — pair the
  * band with a spine-bounded series length, not raw event streams.
  */
case class Dtw(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) => true
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dtw expects (array<bigint>, array<bigint>, int band), got " +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, w: Any): Any =
    Dtw.distance(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray(),
      w match { case i: Int => i; case l: Long => l.toInt })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, w) =>
      s"graft.plans.Dtw.distance($a.toLongArray(), $b.toLongArray(), (int) $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Dtw =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_dtw"
}

object Dtw {

  private val Inf = java.lang.Long.MAX_VALUE / 4

  /** Static DP shared by interpreted eval and codegen. Two rolling rows;
    * exact int64 throughout (costs are |int64 − int64| and path sums are
    * bounded by n·max|a−b| ≪ 2⁶² for any sane series).
    */
  def distance(a: Array[Long], b: Array[Long], w: Int): Long = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0 || w < 0 || math.abs(n - m) > w) return -1L
    var prev = new Array[Long](m)
    var cur = new Array[Long](m)
    java.util.Arrays.fill(prev, Inf)
    var i = 0
    while (i < n) {
      java.util.Arrays.fill(cur, Inf)
      val lo = math.max(0, i - w)
      val hi = math.min(m - 1, i + w)
      var j = lo
      while (j <= hi) {
        val c = math.abs(a(i) - b(j))
        var best = Inf
        if (i == 0 && j == 0) best = 0L
        else {
          if (i > 0 && prev(j) < best) best = prev(j)
          if (i > 0 && j > 0 && prev(j - 1) < best) best = prev(j - 1)
          if (j > 0 && cur(j - 1) < best) best = cur(j - 1)
        }
        if (best < Inf) cur(j) = best + c
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val r = prev(m - 1)
    if (r >= Inf) -1L else r
  }
}
