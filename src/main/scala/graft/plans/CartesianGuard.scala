package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan, OneRowRelation,
  Project, ResolvedHint, SubqueryAlias}

/** Opt-in warehouse guardrail (round 7): reject plans that contain an
  * UNCONDITIONAL cross join when
  *
  *   spark.graft.guard.noCartesian = true        (default false)
  *
  * Why a check rule and not a review comment: at 100 TB a cartesian
  * product is not slow, it is an outage — |A|·|B| rows materialize
  * before any downstream filter runs. Spark's own
  * `spark.sql.crossJoin.enabled` kill-switch disappeared in 3.0 (cross
  * joins became always-legal), so a platform team has no conf-level
  * fence against an accidental `JOIN` without an ON clause reaching a
  * cluster. This rule restores the fence as an analysis-time error —
  * the query fails in milliseconds at submit, not hours into a fill —
  * while still allowing bounded, INTENTIONAL products: a cross join
  * against a PROVABLY-BOUNDED side — an ungrouped Aggregate (one row by
  * construction: every `crossJoin(broadcast(tot))` scalar attach in
  * this repo), a literal LocalRelation, a LIMIT, OneRowRelation — is
  * normal engine practice and passes; only a condition-less Cross/Inner
  * join of two unbounded relations is rejected.
  *
  * Registered via [[graft.GraftExtensions]] (`injectCheckRule`); the
  * engine's own declared plans run with the guard OFF in Verify/Bench
  * (they carry intentional scalar cross joins) — ExtensionsSpec proves
  * both directions.
  */
case class CartesianGuard(spark: SparkSession) extends (LogicalPlan => Unit) {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.guard.noCartesian", "false").toBoolean

  @scala.annotation.tailrec
  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case w: Project => strip(w.child)
    case w: SubqueryAlias => strip(w.child)
    case w: ResolvedHint => strip(w.child)
    case other => other
  }

  /** Provably bounded by construction: one-row global aggregates,
    * literal relations, explicit limits. */
  private def bounded(p: LogicalPlan): Boolean = strip(p) match {
    case a: Aggregate => a.groupingExpressions.isEmpty
    case _: OneRowRelation => true
    case _: LocalRelation => true
    case _: GlobalLimit => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): Unit = if (enabled) {
    plan.foreach {
      case j: Join if j.condition.isEmpty &&
          (j.joinType.sql == "CROSS" || j.joinType.sql == "INNER") &&
          !bounded(j.left) && !bounded(j.right) =>
        // _LEGACY_ERROR_TEMP_3100 is the bare "<message>" template — the
        // conventional carrier for extension-raised analysis errors
        throw new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_3100",
          Map("message" ->
            ("spark.graft.guard.noCartesian is set: unconditional " +
              s"${j.joinType.sql} join is not allowed (|left|*|right| rows " +
              "would materialize). Add a join condition, or unset the guard " +
              "for intentionally-bounded products.")))
      case _ =>
    }
  }
}
