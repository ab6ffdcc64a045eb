package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: guard `levenshtein(a, b) <= k` predicates with the
  * O(1) length-difference bound `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is ≥ the length difference, so the guard is a LOSSLESS
  * prune — but the guard is constant-time while the Levenshtein DP is
  * O(|a|·|b|) per pair. In blocked entity-resolution joins
  * (`Dedup.fuzzyMatch`-shaped queries, usually written by hand in SQL)
  * most candidate pairs fail the cheap bound, so the rewrite removes the
  * dominant cost without the user knowing the trick. This is the
  * `Rule[LogicalPlan]` tier of the custom-operator ladder, injected
  * through [[graft.GraftExtensions]] so plain `spark.sql` text benefits.
  *
  * The rule runs inside a fix-point batch, so it must converge: a
  * predicate already carrying the guard (structurally: an adjacent
  * `abs(length-length) <= k` on the same arguments) is left alone.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def guardFor(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  private def hasGuard(cond: Expression, lev: Levenshtein, k: Expression): Boolean =
    cond.exists {
      case LessThanOrEqual(Abs(Subtract(Length(a), Length(b), _), _), kk) =>
        kk.semanticEquals(k) &&
          ((a.semanticEquals(lev.left) && b.semanticEquals(lev.right)) ||
            (a.semanticEquals(lev.right) && b.semanticEquals(lev.left)))
      case _ => false
    }

  private def rewrite(cond: Expression): Expression =
    cond.transformUp {
      case cmp @ LessThanOrEqual(lev: Levenshtein, k) if k.foldable && !hasGuard(cond, lev, k) =>
        And(guardFor(lev, k), cmp)
      case cmp @ GreaterThanOrEqual(k, lev: Levenshtein) if k.foldable && !hasGuard(cond, lev, k) =>
        And(guardFor(lev, k), cmp)
      case cmp @ LessThan(lev: Levenshtein, k) if k.foldable && !hasGuard(cond, lev, k) =>
        And(guardFor(lev, k), cmp)
    }

  // predicate-pushdown may have moved the threshold into a Join condition
  // before this rule runs — guard it wherever it lives
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = rewrite(cond)
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = rewrite(cond)
      if (rewritten.fastEquals(cond)) j else j.copy(condition = Some(rewritten))
  }
}
