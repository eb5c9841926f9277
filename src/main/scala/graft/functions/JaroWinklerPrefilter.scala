package graft.functions

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression,
  GreaterThanOrEqual, Greatest, Least, Length, LessThanOrEqual, Literal, Multiply,
  PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a `jaro_winkler_similarity(a, b) >= t` filter with t > 0.8
  * gains the implied cheap guard `min(len) >= (5t − 4) · max(len)`.
  *
  * Derivation: with mn = min(|a|,|b|), mx = max(|a|,|b|), matches m ≤ mn, so
  * jaro ≤ (mn/mx + 2)/3; the Winkler boost is at most 0.4·(1 − jaro), giving
  * jw ≤ 0.6·jaro + 0.4 ≤ 0.6·(mn/mx + 2)/3 + 0.4 = 0.2·(mn/mx) + 0.8.
  * Hence jw ≥ t forces mn/mx ≥ 5t − 4 — two codegen'd length reads reject a
  * candidate pair before the O(n·m) matching loop runs, the same physics as
  * [[LevenshteinPrefilter]] for the edit-distance path. For t ≤ 0.8 the bound is
  * vacuous and no guard is added.
  *
  * Sound on edges: an empty side gives jw = 0 (< t), and the guard also rejects
  * (0 ≥ c·mx false for mx > 0); a NULL side nulls both the guard and the
  * original predicate — identical filter semantics either way.
  *
  * Idempotent (guard added only when absent); registered via [[GraftExtensions]].
  */
object JaroWinklerPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def guard(l: Expression, r: Expression, t: Double): Option[Expression] = {
    if (t <= 0.8) None
    else {
      val c = 5.0 * t - 4.0
      Some(GreaterThanOrEqual(
        Cast(Least(Seq(Length(l), Length(r))), DoubleType),
        Multiply(Literal(c, DoubleType),
          Cast(Greatest(Seq(Length(l), Length(r))), DoubleType))))
    }
  }

  private def guardFor(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(JaroWinklerSimilarity(l, r), Literal(t: Double, DoubleType)) =>
      guard(l, r, t)
    case LessThanOrEqual(Literal(t: Double, DoubleType), JaroWinklerSimilarity(l, r)) =>
      guard(l, r, t)
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
