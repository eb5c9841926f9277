package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, Length,
  LessThanOrEqual, Levenshtein, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: every `levenshtein(a, b) <= k` filter gains the implied cheap
  * guard `abs(length(a) - length(b)) <= k` as an extra conjunct.
  *
  * Edit distance is bounded below by the length difference, so the guard rejects
  * exactly the rows the O(n·m) DP would reject anyway — for pennies (two codegen'd
  * length reads). On a banded fuzzy-dedup join at corpus scale most candidate pairs
  * die on the guard before the DP ever runs. This is the declarative-engine payoff:
  * users write the intent (`levenshtein <= k`), the optimizer supplies the physics.
  *
  * Idempotent: the guard is only added when no semantically-equal conjunct already
  * exists, so the optimizer's fixed-point batches terminate. Registered through
  * [[GraftExtensions]] (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def guardFor(e: Expression): Option[Expression] = e match {
    // Two-argument form ONLY: the thresholded levenshtein(a, b, t) returns -1 when
    // the distance exceeds t, so `levenshtein(a,b,t) <= k` can be TRUE for rows the
    // length-delta bound would reject — the guard is unsound there.
    case LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(_, IntegerType)) =>
      Some(LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap(guardFor)
        .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else f.copy(condition = (guards :+ cond).reduce(And))
  }
}
