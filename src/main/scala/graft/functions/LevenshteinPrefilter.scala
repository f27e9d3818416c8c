package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `levenshtein(a, b) <= k` (k literal) in a Filter is
  * rewritten to
  *
  * {{{
  *   abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0
  * }}}
  *
  * Two independent wins, both exact:
  *
  *  1. edit distance is bounded below by the length gap, so the cheap
  *     guard discards rows without running the DP at all;
  *  2. the threshold form runs Spark's banded DP — O(k·n) instead of
  *     O(n·m) — returning −1 past the threshold, hence the `>= 0`
  *     comparison (NULL inputs stay NULL through both forms, and a
  *     FALSE guard implies the original predicate was FALSE, so the
  *     conjunction is semantics-preserving row for row).
  *
  * Idempotent by construction: the rewritten tree only contains the
  * three-argument Levenshtein, which the matcher ignores — safe in the
  * fixed-point "User Provided Optimizers" batch. Registered via
  * [[GraftExtensions]] (conf path) and
  * [[GraftFunctions.register]] (programmatic path).
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def rewrite(a: Expression, b: Expression, k: Literal): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k),
      GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0, IntegerType)))

  private def rewriteCond(cond: Expression): Expression = cond transformUp {
    // a/b are duplicated into the guard, so they must be deterministic
    // (the guard and the DP would otherwise see different evaluations).
    case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType))
        if a.deterministic && b.deterministic =>
      rewrite(a, b, k)
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, None))
        if a.deterministic && b.deterministic =>
      rewrite(a, b, k)
  }

  // Predicate pushdown may move the threshold predicate into a join
  // condition before this batch runs, so both homes are matched.
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val c = rewriteCond(cond)
      if (c fastEquals cond) f else f.copy(condition = c)
    case j @ Join(_, _, _, Some(cond), _) =>
      val c = rewriteCond(cond)
      if (c fastEquals cond) j else j.copy(condition = Some(c))
  }
}
