package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: guard every `levenshtein(a, b) <= k` predicate with the
  * implied-but-cheap `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is bounded below by the length difference, so the guard
  * never changes results — but it changes cost: levenshtein is an O(|a|·|b|)
  * DP per candidate pair, while the guard is two length reads. In a
  * blocked fuzzy join (q58/q62/q73's shape) the predicate runs once per
  * candidate pair inside the join loop; putting the guard FIRST in the
  * conjunction short-circuits the DP for every pair whose lengths already
  * disagree — at 100 TB the candidate-pair stream is the dominant cost,
  * so a constant-time reject ahead of a quadratic check is the difference
  * between "bounded by pairs" and "bounded by pairs x string length²".
  *
  * Fires on Join conditions and Filter predicates; idempotent (skips
  * predicates whose guard is already present), so it is safe in the
  * fixpoint-iterated optimizer batch extension rules run in. The rewrite
  * is `le` → `And(guard, le)`, preserving three-valued-logic semantics:
  * if either side is null, both forms are null.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] {

  private def guardFor(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def key(a: Expression, b: Expression, k: Expression) =
    (a.canonicalized, b.canonicalized, k.canonicalized)

  private[plans] def rewriteCondition(cond: Expression): Expression = {
    val existing = cond.collect {
      case LessThanOrEqual(Abs(Subtract(Length(a), Length(b), _), _), k) =>
        key(a, b, k)
    }.toSet
    cond.transformUp {
      case le @ LessThanOrEqual(Levenshtein(a, b, None), k)
          if k.foldable && !existing.contains(key(a, b, k)) =>
        And(guardFor(a, b, k), le)
      case lt @ LessThan(Levenshtein(a, b, None), k)
          if k.foldable && !existing.contains(key(a, b, k)) =>
        // d < k implies |len diff| < k, and <= k is a superset — safe
        And(LessThan(Abs(Subtract(Length(a), Length(b))), k), lt)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = rewriteCondition(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
    case f @ Filter(cond, _) =>
      val rewritten = rewriteCondition(cond)
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }
}
