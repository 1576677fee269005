package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (SURVEY.md §4 custom-hook demo): users who write the
  * pure-builtin dot product
  *
  *   aggregate(zip_with(x, y, (a, b) -> a * b), 0.0, (acc, v) -> acc + v)
  *
  * (with optional double-casts inside the lambda) transparently get the
  * codegen'd [[DotProduct]] expression instead — the declarative plan is
  * the API, the rule picks the faster physical expression. Numerically
  * identical: same left-to-right double accumulation.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(child, DoubleType, _, _) => child
    case other                         => other
  }

  private def isFloatOrDoubleArray(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // aggregate(zip_with(x, y, (a,b) -> CAST(a)*CAST(b)), 0.0, (acc,v) -> acc+v)
    case ArrayAggregate(
        ZipWith(x, y,
          LambdaFunction(Multiply(ml, mr, _), Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if isFloatOrDoubleArray(x) && isFloatOrDoubleArray(y) &&
        zero.foldable && zero.eval() == 0.0 &&
        stripCast(ml).semanticEquals(a) && stripCast(mr).semanticEquals(b) &&
        al.semanticEquals(acc) && ar.semanticEquals(v) &&
        isIdentityFinish(finish) =>
      DotProduct(x, y)
  }

  /** finish lambda is identity (the default 3-arg aggregate form). */
  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) => body.semanticEquals(arg)
    case _                                                      => false
  }
}
