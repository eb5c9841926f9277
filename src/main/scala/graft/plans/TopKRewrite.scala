package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  CreateNamedStruct, Descending, EqualTo, Expression, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal, NullsFirst, NullsLast, SortOrder, WindowExpression,
  WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.{RowNumber}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project,
  Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.IntegerType

/** OPT-IN optimizer rule: the declarative top-k-per-group idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(g).orderBy(s)))
  *      .filter($"rn" <= k).drop("rn") }}}
  *
  * is rewritten to the native [[TopKPerGroup]] operator — the user writes the
  * intent, the engine swaps the full-partition sort for bounded k-row buffers
  * (map-side partials, k·|keys| shuffle rows). This is the declarative-engine
  * payoff applied to a whole OPERATOR, not just a predicate (compare
  * [[graft.functions.LevenshteinPrefilter]]).
  *
  * Soundness gates — the rewrite fires only when it provably preserves results:
  *  - the row_number attribute is used ONLY by the `rn <= k` / `rn < k` /
  *    `k >= rn` filter and projected away immediately above (the common idiom);
  *  - every sort key either asks for NULLS LAST (the native buffer's ordering)
  *    or cannot produce a null at all;
  *  - sort directions are all-ascending or all-descending (mapped to the
  *    operator's single direction flag; mixed directions keep the window).
  *
  * Ties beyond position k are kept per the sort order exactly like row_number
  * evaluates them: both formulations pick an arbitrary-but-valid subset unless
  * the caller makes the order total — same contract, stated in TopKPerGroup's
  * docs. Registered ONLY via [[TopK.enableRewrite]] (never by GraftExtensions
  * default wiring): the rewrite changes physical shape session-wide, which a
  * user should choose, not inherit.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def kFrom(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  // The native buffer orders nulls LAST in either direction, row_number honors
  // the SortOrder's nullOrdering — so a sort key is safe when it asks for
  // NULLS LAST, or can never produce a null at all.
  private def nullSafe(o: SortOrder): Boolean =
    o.nullOrdering == NullsLast || !o.child.nullable

  private def direction(order: Seq[SortOrder]): Option[Boolean] =
    if (order.nonEmpty && order.forall(o => o.direction == Ascending && nullSafe(o)))
      Some(false)
    else if (order.nonEmpty &&
        order.forall(o => o.direction == Descending && nullSafe(o)))
      Some(true)
    else None

  private def sortKey(order: Seq[SortOrder]): Expression =
    if (order.size == 1) order.head.child
    else CreateNamedStruct(order.zipWithIndex.flatMap { case (o, i) =>
      Seq(Literal(s"c$i"), o.child)
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(cols,
        Filter(cond, Window(Seq(alias @ Alias(
          WindowExpression(_: RowNumber, WindowSpecDefinition(parts, order, _)),
          _)), _, _, child, _)))
        if kFrom(cond, alias.toAttribute).isDefined &&
          direction(order).isDefined &&
          cols.forall(!_.references.contains(alias.toAttribute)) &&
          cols.forall(_.references.subsetOf(child.outputSet)) =>
      val k = kFrom(cond, alias.toAttribute).get
      // Spark's InferWindowGroupLimit may already have slid a WindowGroupLimit
      // under the window; the native operator subsumes it (and its sort) exactly
      val base = child match {
        case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
          wgl.child
        case other => other
      }
      if (k <= 0) p
      else Project(cols,
        TopKPerGroup(parts, sortKey(order), k, direction(order).get, base))
  }
}

object TopKRewriteSupport {
  /** Opt in: vanilla `row_number <= k` windows in this session plan as
    * [[TopKPerGroupExec]] (requires the strategy too). */
  def enableRewrite(spark: SparkSession): Unit = {
    TopK.ensureStrategy(spark)
    val exp = Bridge.experimental(spark)
    if (!exp.extraOptimizations.contains(TopKRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ TopKRewrite
  }
}
