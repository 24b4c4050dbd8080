package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `levenshtein(a, b) <= k` (k a non-negative int
  * literal) into the THRESHOLD form `levenshtein(a, b, k) >= 0`.
  *
  * The two are semantically identical — the threshold form returns the
  * distance when it is ≤ k and −1 otherwise, and both propagate nulls —
  * but execution differs asymptotically: the unbounded form fills the
  * full O(|a|·|b|) dynamic-programming table, while the threshold form
  * runs the Ukkonen-banded O(k·min(|a|,|b|)) computation with early
  * exit. Every fuzzy-match WHERE clause a SQL user writes naturally
  * ("edit distance at most 2") is the bounded question; Spark's own
  * optimizer does not perform this rewrite, so the library injects it
  * via [[graft.GraftExtensions]] — ad-hoc SQL gets the banded plan
  * without knowing the three-argument form exists. All four literal
  * comparison orientations are covered; `k` must be a literal so the
  * band is known at plan time.
  */
object RewriteBandedLevenshtein extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 2 => banded(a, b, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => banded(a, b, k)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 2 => banded(a, b, k - 1)
    }
}
