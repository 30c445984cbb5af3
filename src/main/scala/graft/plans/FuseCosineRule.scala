package graft.plans

import graft.functions.CosineSimilarityExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the composable higher-order-function cosine —
  *
  *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)
  *     / (sqrt(aggregate(transform(a, x -> double(x)*double(x)), 0.0, +))
  *        * sqrt(aggregate(transform(b, …), 0.0, +)))
  *
  * — and fuse it into the single-pass codegen'd CosineSimilarityExpr.
  * Sum-fold order, per-element casts, and null semantics (unequal lengths /
  * null elements → NULL) are identical, so the rewrite is value-preserving
  * bit-for-bit; it turns five interpreted lambda walks into one primitive
  * loop. One documented deviation: on a zero-norm vector the unfused form
  * under ANSI mode raises DIVIDE_BY_ZERO, while the fused form returns IEEE
  * NaN (matching non-ANSI and DuckDB) — the rewrite rescues that error.
  * Applies only to array<float> inputs (the expression's contract).
  * Injected by graft.GraftExtensions, so `spark.sql` users writing the
  * textbook HOF formula get the fused operator for free.
  */
object FuseCosineRule extends Rule[LogicalPlan] {

  private def isDoubleZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** λ(x, y) -> x + y over the two lambda variables, any order-preserving use. */
  private def isSumLambda(e: Expression): Boolean = e match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _), Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      l.exprId == a.exprId && r.exprId == b.exprId
    case _ => false
  }

  private def isIdentityLambda(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  private def doubleCastOf(e: Expression): Option[NamedLambdaVariable] = e match {
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
    case _ => None
  }

  /** aggregate(zip_with(a, b, (x,y) -> dx*dy), 0.0, +, id) → (a, b). */
  private def matchDot(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(ZipWith(a, b,
          LambdaFunction(Multiply(cx, cy, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero, merge, finish)
        if isDoubleZero(zero) && isSumLambda(merge) && isIdentityLambda(finish) =>
      (doubleCastOf(cx), doubleCastOf(cy)) match {
        case (Some(vx), Some(vy)) if vx.exprId == x.exprId && vy.exprId == y.exprId => Some((a, b))
        case _ => None
      }
    case _ => None
  }

  /** aggregate(transform(a, x -> dx*dx), 0.0, +, id) → a. */
  private def matchNormSq(e: Expression): Option[Expression] = e match {
    case ArrayAggregate(ArrayTransform(a,
          LambdaFunction(Multiply(c1, c2, _), Seq(x: NamedLambdaVariable), _)),
        zero, merge, finish)
        if isDoubleZero(zero) && isSumLambda(merge) && isIdentityLambda(finish) =>
      (doubleCastOf(c1), doubleCastOf(c2)) match {
        case (Some(v1), Some(v2)) if v1.exprId == x.exprId && v2.exprId == x.exprId => Some(a)
        case _ => None
      }
    case _ => None
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case d @ Divide(dot, Multiply(Sqrt(na), Sqrt(nb), _), _) =>
      (matchDot(dot), matchNormSq(na), matchNormSq(nb)) match {
        case (Some((a, b)), Some(a2), Some(b2))
            if a.semanticEquals(a2) && b.semanticEquals(b2) &&
              isFloatArray(a) && isFloatArray(b) =>
          CosineSimilarityExpr(a, b)
        case _ => d
      }
  }
}
