package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `levenshtein(a, b) <= d` implies
  * `abs(length(a) - length(b)) <= d` (edit distance is bounded below
  * by the length difference — each edit changes length by at most 1),
  * so the cheap length comparison can run BEFORE the O(|a|·|b|)
  * dynamic program and prune most candidate pairs of a fuzzy-match
  * join. Measured on q67's brand-blocked pair join this ordering is
  * the difference between one task grinding through every DP and the
  * filter discarding the bulk of pairs at codegen speed.
  *
  * The rewrite adds the implied guard in front of the original
  * predicate (`guard AND original`), never replaces it — results are
  * identical by the metric property. Only comparisons that are
  * themselves TOP-LEVEL CONJUNCTS of the Filter condition are
  * guarded: a `levenshtein(a,b) <= d` nested under `NOT`, `OR`, or
  * `CASE WHEN` does not imply the guard holds for every surviving
  * row, so conjoining it at the top level would wrongly drop rows
  * (e.g. `NOT(lev <= 2)` keeps exactly the pairs whose lengths may
  * differ by more than 2). Idempotent under the optimizer's fixpoint
  * iteration: a comparison already accompanied by its guard conjunct
  * is left alone.
  *
  * Registered via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) — the engine's example of extending
  * Catalyst's LOGICAL optimization, alongside the physical-side
  * [[graft.functions.FloatVecDot]] codegen expression.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def guardFor(a: Expression, b: Expression, d: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), d)

  private def isGuard(e: Expression, a: Expression, b: Expression): Boolean = e match {
    case LessThanOrEqual(Abs(Subtract(Length(x), Length(y), _), _), _) =>
      (x.semanticEquals(a) && y.semanticEquals(b)) ||
        (x.semanticEquals(b) && y.semanticEquals(a))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      // Only comparisons that ARE top-level conjuncts imply the guard
      // for every surviving row; nested occurrences (NOT/OR/CASE) do
      // not, and must be left untouched.
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = scala.collection.mutable.ArrayBuffer.empty[Expression]
      conjuncts.foreach {
        // only the un-thresholded 2-arg form compared to a literal
        // bound; the thresholded variant already early-exits its DP
        case LessThanOrEqual(Levenshtein(a, b, None), d: Literal)
            if !conjuncts.exists(isGuard(_, a, b)) =>
          guards += guardFor(a, b, d)
        case LessThan(Levenshtein(a, b, None), d: Literal)
            if !conjuncts.exists(isGuard(_, a, b)) =>
          guards += guardFor(a, b, d)
        case _ => ()
      }
      if (guards.isEmpty) f
      else f.copy(condition = guards.distinct.foldRight(cond)(And(_, _)))
  }
}
