package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType

import graft.sources.{CommitLog, MvRegistry}

/** Automatic materialized-view rewrite (the Calcite/"aggregate rewriting
  * over materialized views" idea, Goldstein & Larson SIGMOD'01): an
  * aggregate over a BASE commitlog table is rerouted to a registered
  * [[graft.sources.IncrementalView]] whenever the view provably answers
  * it — the user keeps querying the raw table, the optimizer substitutes
  * the group-cardinality-sized view. At 100 TB the difference is reading
  * a few thousand pre-folded rows instead of re-scanning the fact table:
  * the aggregate's cost stops depending on corpus size entirely.
  *
  * Fires ONLY when the rewrite is provably exact:
  *   - the child is the bare base relation (or a pure column projection);
  *     any Filter/Join in between keeps the real scan (the view folds the
  *     WHOLE table, so a filtered aggregate is not derivable from it);
  *   - every grouping expression is a plain column contained in the
  *     view's grouping set (a strict subset re-aggregates the view — the
  *     classic rollup derivation; exact because COUNT adds and the
  *     view's DECIMAL sums are associative);
  *   - every aggregate is `count(*)` → `coalesce(sum(cnt), 0)` or the
  *     view's own measure shape `sum(CAST(value AS DECIMAL(18,6)))` →
  *     `sum(sum_val)` (the [[graft.operators.Exact]] discipline; a raw
  *     double `sum(value)` is order-dependent and NOT equal to the
  *     view's exact fold, so it correctly keeps the scan), with no
  *     DISTINCT and no FILTER clause;
  *   - the version the query will read — pinned (time travel), else
  *     current — is exactly the source version the view's last refresh
  *     reflected (`mv.srcVersion`); one stale append and the rule
  *     declines. Result types are re-checked expression-for-expression
  *     before substituting, so a rewrite can never change the schema.
  * `spark.graft.mvRewrite.enabled=false` turns the rewrite off.
  */
object MvRewrite extends Rule[LogicalPlan] {

  private[plans] val EnabledConf = "spark.graft.mvRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.active
    if (spark.conf.getOption(EnabledConf).contains("false")) return plan
    plan.transform {
      case agg @ Aggregate(groups, _, child, _)
          if groups.forall(_.isInstanceOf[AttributeReference]) &&
            MetadataAggregate.relationOf(child).isDefined =>
        rewrite(spark, agg).getOrElse(agg)
    }
  }

  private def rewrite(spark: SparkSession, agg: Aggregate): Option[LogicalPlan] = {
    val groupNames = agg.groupingExpressions.collect {
      case a: AttributeReference => a.name
    }
    for {
      (root, pinned) <- MetadataAggregate.relationOf(agg.child)
      mv <- MvRegistry.fresh(root, pinned)
        .find(m => groupNames.forall(m.groupCols.contains))
      mvPlan = CommitLog.read(spark, mv.viewRoot).queryExecution.analyzed
      mvAttr = mvPlan.output.map(a => a.name -> a).toMap
      if mvAttr.contains("cnt") && mvAttr.contains("sum_val") &&
        groupNames.forall(mvAttr.contains)
      newGroups <- seqOpt(agg.groupingExpressions.map {
        case a: AttributeReference => mvAttr.get(a.name): Option[Expression]
        case _ => None
      })
      newExprs <- seqOpt(agg.aggregateExpressions.map(
        top(_, groupNames.toSet, mvAttr, mv.valueCol)))
      // schema safety net: substitution must be invisible type-for-type
      if newExprs.zip(agg.aggregateExpressions).forall {
        case (n, o) => n.dataType == o.dataType && n.name == o.name
      }
    } yield agg.copy(groupingExpressions = newGroups,
      aggregateExpressions = newExprs, child = mvPlan)
  }

  private def seqOpt[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.flatten) else None

  /** Rewrite one output expression, preserving its exprId (parents above
    * the Aggregate keep resolving); None declines the whole query.
    */
  private def top(ne: NamedExpression, groupNames: Set[String],
      mvAttr: Map[String, Attribute], valueCol: String): Option[NamedExpression] =
    ne match {
      case a: AttributeReference if groupNames.contains(a.name) =>
        mvAttr.get(a.name).map(m =>
          Alias(m, a.name)(exprId = a.exprId, qualifier = a.qualifier))
      case al: Alias =>
        body(al.child, groupNames, mvAttr, valueCol).map(c =>
          al.copy(child = c)(al.exprId, al.qualifier, al.explicitMetadata,
            al.nonInheritableMetadataKeys))
      case _ => None
    }

  private def body(e: Expression, groupNames: Set[String],
      mvAttr: Map[String, Attribute], valueCol: String): Option[Expression] =
    e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          // count(*) over the base ≡ the sum of per-group counts; the
          // coalesce restores COUNT's 0-on-empty (SUM is null-on-empty)
          case Count(Seq(l: Literal)) if l.value != null =>
            Some(Coalesce(Seq(
              ae.copy(aggregateFunction = Sum(mvAttr("cnt"))),
              Literal(0L))))
          // the view's exact-decimal measure: same Sum eval mode, same
          // DECIMAL(18,6) element type ⇒ same DECIMAL(28,6) result type,
          // and associativity makes partial-fold ≡ full fold bit-for-bit
          case su: Sum => su.child match {
            case Cast(a: AttributeReference, d: DecimalType, _, _)
                if a.name == valueCol && d.precision == 18 && d.scale == 6 =>
              Some(ae.copy(aggregateFunction =
                su.copy(child = mvAttr("sum_val"))))
            case _ => None
          }
          case _ => None
        }
      case _: AggregateExpression => None
      case a: AttributeReference =>
        if (groupNames.contains(a.name)) mvAttr.get(a.name) else None
      case other =>
        val kids = other.children.map(body(_, groupNames, mvAttr, valueCol))
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.flatten))
        else None
    }
}
