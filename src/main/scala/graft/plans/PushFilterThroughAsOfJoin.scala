package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for graft's custom as-of join: Catalyst can't see
  * through an unknown node, so a `Filter` written above `asofJoin(...)`
  * would otherwise run AFTER the join — scanning and shuffling rows the
  * query provably discards. This rule splits the conjunction and pushes
  * every predicate that references only probe-side (left) columns below
  * the join, where normal pushdown then carries it into the parquet
  * scan. At 100 TB that is the difference between shuffling the whole
  * probe table and shuffling the selected keys.
  *
  * (Left side only: right-side predicates are NOT semantically safe to
  * push — removing build rows changes which row is "latest prior".)
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
