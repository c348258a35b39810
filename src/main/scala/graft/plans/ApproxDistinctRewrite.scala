package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §4.1 exercise target): rewrite exact
  * `COUNT(DISTINCT x)` into `approx_count_distinct(x)` (HyperLogLog++)
  * when `spark.graft.approxDistinct.enabled` is set.
  *
  * Why: at 100 TB an exact distinct count forces an Expand + second
  * shuffle keyed by the counted column; the HLL sketch is a single
  * mergeable partial aggregate — orders of magnitude less shuffle for
  * cardinality-style dashboards that tolerate ~2% error. The rewrite is
  * opt-in per session/query; correctness-gated paths leave it off.
  *
  * Only single-argument distinct counts rewrite; multi-column distinct
  * and filtered aggregates pass through untouched.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformAllExpressions {
      // NB: `child :: Nil` would silently never match — Count.children
      // is an ArraySeq, and `::` patterns only match List.
      case AggregateExpression(Count(Seq(child)), mode, true, filter, id)
          if filter.isEmpty =>
        AggregateExpression(
          HyperLogLogPlusPlus(child), mode, isDistinct = false, filter, id)
    }

  /** Attach to an existing session (ExperimentalMethods — the public
    * per-session hook).
    */
  def registerOn(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` entry point for
  * cluster-wide injection (SparkSessionExtensions tier of the custom-
  * operator preference order).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ApproxDistinctRewrite)
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    // SQL DML (DELETE/UPDATE/MERGE) over the lakehouse DSv2 tables —
    // MUST be an analyzer rule: CheckAnalysis refuses UPDATE/MERGE on
    // tables without SupportsRowLevelOperations before any planner
    // strategy runs (the DeltaSparkSessionExtension pattern)
    e.injectResolutionRule(_ => new graft.sources.dsv2.GraftDmlRule)
    e.injectPlannerStrategy(_ => new graft.sources.dsv2.GraftDmlStrategy)
    // the SQL function surface (same builders GraftFunctions.registerAll
    // attaches per-session) — cluster-wide, so Thrift/JDBC sessions see
    // them from their first query
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        builder))
    }
  }
}
