package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

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

  private def isLongOrIntArray(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
      case _                                                  => false
    })

  /** Strips the implicit widening cast the analyzer inserts when a
    * bigint array zips with an int array (x * s with s an int literal
    * array — the SRP sign-projection shape).
    */
  private def stripLongCast(e: Expression): Expression = e match {
    case Cast(child, LongType, _, _) => child
    case other                       => other
  }

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

    // aggregate(zip_with(x, y, (a,b) -> a*b), 0L, (acc,v) -> acc+v)
    // over bigint/int arrays — the integer-grid dot (Q198/Q248/Q302/
    // Q322/Q346/Q347 candidate scoring). Same exact int64 value; see
    // DotProductLong's scaladoc for the overflow-loudness contract.
    case ArrayAggregate(
        ZipWith(x, y,
          LambdaFunction(Multiply(ml, mr, _), Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if isLongOrIntArray(x) && isLongOrIntArray(y) &&
        zero.foldable && zero.dataType == LongType && zero.eval() == 0L &&
        stripLongCast(ml).semanticEquals(a) && stripLongCast(mr).semanticEquals(b) &&
        al.semanticEquals(acc) && ar.semanticEquals(v) &&
        isIdentityFinish(finish) =>
      DotProductLong(x, y)

    // aggregate(zip_with(x, y, (a,b) -> (a-b)*(a-b)), 0L, (acc,v) -> acc+v)
    // over bigint/int arrays — the integer-grid squared L2 distance.
    case ArrayAggregate(
        ZipWith(x, y,
          LambdaFunction(
            Multiply(Subtract(s1l, s1r, _), Subtract(s2l, s2r, _), _),
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if isLongOrIntArray(x) && isLongOrIntArray(y) &&
        zero.foldable && zero.dataType == LongType && zero.eval() == 0L &&
        stripLongCast(s1l).semanticEquals(a) && stripLongCast(s1r).semanticEquals(b) &&
        stripLongCast(s2l).semanticEquals(a) && stripLongCast(s2r).semanticEquals(b) &&
        al.semanticEquals(acc) && ar.semanticEquals(v) &&
        isIdentityFinish(finish) =>
      SqDistLong(x, y)

    // aggregate(transform(x, v -> v*v), 0L, (acc,v) -> acc+v) over a
    // bigint/int array — the integer-grid self-dot (norms).
    case ArrayAggregate(
        ArrayTransform(x,
          LambdaFunction(Multiply(ml, mr, _), Seq(a: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if isLongOrIntArray(x) &&
        zero.foldable && zero.dataType == LongType && zero.eval() == 0L &&
        stripLongCast(ml).semanticEquals(a) && stripLongCast(mr).semanticEquals(a) &&
        al.semanticEquals(acc) && ar.semanticEquals(v) &&
        isIdentityFinish(finish) =>
      DotProductLong(x, x)
  }

  /** finish lambda is identity (the default 3-arg aggregate form). */
  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) => body.semanticEquals(arg)
    case _                                                      => false
  }
}
