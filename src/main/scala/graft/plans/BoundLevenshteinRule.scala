package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a comparison of an UNBOUNDED `levenshtein(a, b)`
  * against an integer literal is rewritten to the THRESHOLD form
  * `levenshtein(a, b, k)`, which runs the banded O(k·min(|a|,|b|)) DP
  * and abandons a pair the moment the band exceeds k — instead of
  * filling the full O(|a|·|b|) matrix and then comparing (q93's scaladoc
  * quantifies the win; on a long non-matching pair it is the difference
  * between rejecting at the length gap and computing everything).
  *
  * The bounded form returns −1 when the distance exceeds the threshold
  * and the exact distance otherwise, so the rewrites are value-identical
  * (NULL inputs stay NULL through both forms):
  *
  *   dist <= k  ⟺  levenshtein(a, b, k)   >= 0       (k ≥ 0)
  *   dist <  k  ⟺  levenshtein(a, b, k−1) >= 0       (k ≥ 1)
  *   dist >  k  ⟺  levenshtein(a, b, k)   <  0       (k ≥ 0)
  *   dist >= k  ⟺  levenshtein(a, b, k−1) <  0       (k ≥ 1)
  *
  * Injected by [[graft.GraftExtensions]]: `spark.sql` users writing the
  * natural unbounded predicate get the banded kernel for free.
  */
object BoundLevenshteinRule extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    Levenshtein(a, b, Some(Literal(k)))

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), IntLit(k)) if k >= 0 =>
      GreaterThanOrEqual(bounded(a, b, k), Literal(0))
    case GreaterThanOrEqual(IntLit(k), Levenshtein(a, b, None)) if k >= 0 =>
      GreaterThanOrEqual(bounded(a, b, k), Literal(0))
    case LessThan(Levenshtein(a, b, None), IntLit(k)) if k >= 1 =>
      GreaterThanOrEqual(bounded(a, b, k - 1), Literal(0))
    case GreaterThan(IntLit(k), Levenshtein(a, b, None)) if k >= 1 =>
      GreaterThanOrEqual(bounded(a, b, k - 1), Literal(0))
    case GreaterThan(Levenshtein(a, b, None), IntLit(k)) if k >= 0 =>
      LessThan(bounded(a, b, k), Literal(0))
    case LessThan(IntLit(k), Levenshtein(a, b, None)) if k >= 0 =>
      LessThan(bounded(a, b, k), Literal(0))
    case GreaterThanOrEqual(Levenshtein(a, b, None), IntLit(k)) if k >= 1 =>
      LessThan(bounded(a, b, k - 1), Literal(0))
    case LessThanOrEqual(IntLit(k), Levenshtein(a, b, None)) if k >= 1 =>
      LessThan(bounded(a, b, k - 1), Literal(0))
  }
}
