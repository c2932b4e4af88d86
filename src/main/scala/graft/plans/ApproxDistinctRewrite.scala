package graft.plans

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `count(DISTINCT x)` into the
  * HyperLogLog++ sketch aggregate (±2% rsd) when the session sets
  * `spark.graft.approxDistinct=true`.
  *
  * This is the engine-level exactness↔scale knob: an exact distinct
  * count expands into a two-phase distinct-then-count that shuffles
  * every distinct (group, value) pair, while the sketch ships one
  * ~KB buffer per group per task. A 100 TB dashboard query opts in
  * with one config flip — no query rewrite, and result columns keep
  * their names because only the aggregate function under the alias
  * changes.
  *
  * Deliberately narrow: single-argument, unfiltered distinct counts
  * only. Multi-arg distincts (joint distinct) and FILTER clauses keep
  * their exact semantics — silently approximating those would change
  * answers the user never asked to trade away.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.approxDistinct", "false") != "true") plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
                Count(Seq(child)), _, true, None, _) =>
            AggregateExpression(
              HyperLogLogPlusPlus(child, relativeSD = 0.02),
              Complete, isDistinct = false, filter = None, ae.resultId)
        }
    }
}
