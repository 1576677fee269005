package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator custom plan (SURVEY.md §4 / builder-prompt preference
  * (c)): a native sort-merge AS-OF JOIN — for every left row, the latest
  * right row of the same key with right time ≤ left time — as a first-class
  * physical operator, because Spark has no ASOF join.
  *
  * Execution contract, declared not hand-built: the node REQUIRES
  * hash-clustering on the key and (key, time) sort order from both
  * children; Catalyst's EnsureRequirements inserts the exchanges and sorts
  * exactly as it does for SortMergeJoin. doExecute is then a one-pass
  * two-pointer merge per co-partition: O(n+m), no buffering beyond one
  * carried value, arbitrary skew tolerated because a hot key stays within
  * one partition pass.
  *
  * Scale: same shuffle footprint as any keyed join (one exchange per
  * side), state = one value per in-flight key. Compare Joins.asofJoin,
  * the pure-DataFrame union-sort-fill form — same semantics, this one
  * avoids the union and the ignore-nulls window chase.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightValue: Attribute,
    asofOutput: AttributeReference)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofOutput
  // The asof column is PRODUCED here, not consumed from a child —
  // without this CheckAnalysis reports it as a missing input attribute.
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightValue: Expression,
    asofOutput: AttributeReference,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofOutput

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rVal = BindReferences.bindReference(rightValue, right.output)
    val leftOutput = left.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = GenerateUnsafeProjection.generate(
        leftOutput.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        } :+ BoundReference(leftOutput.size, asofOutput.dataType, nullable = true))
      val joined = new JoinedRow
      val valueRow = new GenericInternalRow(1)

      var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var carriedKey = 0L
      var carried: Any = null
      var hasCarried = false

      // NULL discipline: a NULL right key/time can never match (SQL join
      // semantics) — such rows are skipped; a NULL left key/time matches
      // nothing and emits a NULL asof value, keeping the left row (as-of
      // preserves the left side like a left outer join). Spark's
      // nulls-first sort order puts NULL right rows at the partition head,
      // so skipping them before the merge keeps the two-pointer invariant.
      lIter.map { lRow =>
        val kRaw = lKey.eval(lRow)
        val tRaw = lTime.eval(lRow)
        if (kRaw == null || tRaw == null) {
          valueRow.update(0, null)
          proj(joined(lRow, valueRow))
        } else {
          val k = kRaw.asInstanceOf[Long]
          val t = tRaw.asInstanceOf[Long]
          // Advance the right side while it is still at-or-before (k, t).
          var advancing = rRow != null
          while (advancing) {
            val rkRaw = rKey.eval(rRow)
            val rtRaw = rTime.eval(rRow)
            if (rkRaw == null || rtRaw == null) {
              if (rIter.hasNext) rRow = rIter.next().copy()
              else { rRow = null; advancing = false }
            } else {
              val rk = rkRaw.asInstanceOf[Long]
              val rt = rtRaw.asInstanceOf[Long]
              if (rk < k || (rk == k && rt <= t)) {
                if (rk == k) {
                  carried = rVal.eval(rRow) match {
                    case s: UTF8String => s.copy()
                    case v             => v
                  }
                  carriedKey = k
                  hasCarried = true
                }
                if (rIter.hasNext) rRow = rIter.next().copy()
                else { rRow = null; advancing = false }
              } else advancing = false
            }
          }
          valueRow.update(0, if (hasCarried && carriedKey == k) carried else null)
          proj(joined(lRow, valueRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. Injected by
  * GraftExtensions (builder-owned sessions) or via
  * spark.experimental.extraStrategies (runtime, used by graft.Catalog).
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, rv, out) =>
      AsOfJoinExec(lk, lt, rk, rt, rv, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
