package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-distinct mode: a `Rule[LogicalPlan]` (injected via
  * [[graft.GraftExtensions]], SURVEY.md §4.3) that rewrites exact
  * `COUNT(DISTINCT x)` aggregates into HLL sketch estimates when
  *
  *   spark.graft.approx.countDistinct = true        (default false)
  *   spark.graft.approx.countDistinct.p = 12        (sketch precision)
  *
  * Why a rule and not a function: at 100 TB the difference between exact
  * and approximate distinct is structural, not cosmetic — exact distinct
  * re-shuffles the FACT table on (group, x) to dedup before counting
  * (Spark's RewriteDistinctAggregates expand), while the HLL sketch is a
  * mergeable 2^p-byte buffer that rides the ordinary partial/final
  * aggregate path: one shuffle of O(groups) sketches, no fact re-shuffle,
  * and unchanged query text. Flipping one conf turns every dashboard's
  * count-distinct into the sketch plan — the user's SQL doesn't know.
  *
  * Scope guards (deliberately narrow):
  *  - only single-argument COUNT(DISTINCT x) — multi-arg distinct tuples
  *    and other distinct aggregates (SUM DISTINCT …) stay exact;
  *  - FILTER clauses are preserved on the rewritten aggregate;
  *  - runs in the operator-optimization batch, BEFORE Spark's
  *    RewriteDistinctAggregates expands the distinct into the two-shuffle
  *    plan, so the match sees `isDistinct = true` unexpanded.
  *
  * Result type matches Count (BIGINT, non-nullable: the sketch aggregate
  * is non-nullable and estimate is a total function), so downstream
  * references through the original Alias are untouched.
  */
case class ApproxDistinctRewrite(spark: SparkSession)
  extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.approx.countDistinct", "false").toBoolean

  private def precision: Int =
    spark.conf.get("spark.graft.approx.countDistinct.p", "12").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        val p = precision
        val rewritten = agg.aggregateExpressions.map { ne =>
          ne.transformUp {
            case ae @ AggregateExpression(Count(Seq(child)), mode, true, filter, _) =>
              HllEstimate(AggregateExpression(
                HllSketchAgg(child, p), mode, isDistinct = false, filter,
                NamedExpression.newExprId))
          }.asInstanceOf[NamedExpression]
        }
        agg.copy(aggregateExpressions = rewritten)
    }
}
