package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, Coalesce, Literal, Pmod, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Opt-in optimizer rule: rewrite an eligible `groupBy(...).agg(...)`
  * into the ev08 two-phase SALTED shape when the session sets
  * `spark.graft.saltSkew=N` (N ≥ 2) — phase 1 aggregates on
  * (keys, salt) spreading each hot key over N reducers, phase 2
  * combines the N partials per key. The salt is deterministic
  * (xxhash64 of the full input row mod N), so retries and AQE replans
  * see the same distribution.
  *
  * When it matters: Spark's hash partial aggregation already bounds a
  * hot key's reducer input to one partial per map task; this rewrite
  * targets the residual cases where that protection fails — map-side
  * agg falling back to sort-based spill under memory pressure, or
  * high-cardinality group mixes that evict the hot key from the
  * partial hash map — the q43-audit → ev08-shape escalation path,
  * applied by the engine instead of by hand.
  *
  * Deliberately narrow (the ApproxDistinctRewrite discipline): only
  * aggregates whose outputs are grouping keys or top-level
  * sum/count/min/max (no DISTINCT, no FILTER, no expression-of-
  * aggregate, no decimal sums — a decimal sum-of-sums widens the
  * result type and would silently change the schema). Everything else
  * keeps its plan. Result attribute ids, names, types, and
  * nullability are preserved (count's non-nullability via a coalesce
  * around the combining sum), so downstream operators are untouched.
  * The rule runs inside a fixed-point batch, so its own two phases are
  * recognized by the salt / partial markers and never re-salted.
  */
object SaltSkewRewrite extends Rule[LogicalPlan] {

  private val saltName = "__graft_salt"
  private val partialSuffix = "__graft_partial"

  private def combinable(ae: AggregateExpression): Boolean = ae match {
    case AggregateExpression(fn, Complete, false, None, _) => fn match {
      case s: Sum => !s.child.dataType.isInstanceOf[DecimalType]
      case _: Count | _: Min | _: Max => true
      case _ => false
    }
    case _ => false
  }

  /** Our own phase-1/phase-2 shapes, recognized so the fixed-point
    * batch does not salt them again. */
  private def alreadySalted(agg: Aggregate): Boolean =
    agg.groupingExpressions.exists {
      case a: Attribute => a.name == saltName
      case _ => false
    } || (agg.child match {
      case inner: Aggregate => inner.aggregateExpressions.exists(
        _.name.endsWith(partialSuffix))
      case _ => false
    })

  private def eligible(agg: Aggregate): Boolean =
    agg.groupingExpressions.nonEmpty &&
      agg.groupingExpressions.forall(_.isInstanceOf[Attribute]) &&
      agg.aggregateExpressions.forall {
        case a: AttributeReference =>
          agg.groupingExpressions.exists(_.semanticEquals(a))
        case Alias(a: AttributeReference, _) =>
          agg.groupingExpressions.exists(_.semanticEquals(a))
        case Alias(ae: AggregateExpression, _) => combinable(ae)
        case _ => false
      } &&
      // at least one real aggregate, else there is nothing to combine
      agg.aggregateExpressions.exists {
        case Alias(_: AggregateExpression, _) => true
        case _ => false
      }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val n = conf.getConfString("spark.graft.saltSkew", "0").toInt
    if (n < 2) plan
    else plan.transform {
      case agg: Aggregate if !alreadySalted(agg) && eligible(agg) &&
          // decline when every referenced column is a grouping key
          // (e.g. groupBy(k).agg(count(*))): the salt would hash the
          // key alone, giving every row of a hot key the SAME salt —
          // phase 1 keeps the original cardinality and the rewrite
          // adds a pass with zero spreading. A no-op beats a free
          // extra aggregate.
          !agg.references.forall(c =>
            agg.groupingExpressions.exists(_.semanticEquals(c))) =>
        // salt only the columns the aggregate already references (in a
        // deterministic order) — hashing the full row would pin every
        // column into the scan and defeat column pruning / pushdown
        val saltCols = agg.references.toSeq.sortBy(_.exprId.id)
        val salt = Alias(
          Pmod(XxHash64(saltCols, 42L), Literal(n.toLong, LongType)),
          saltName)()
        val groupAttrs = agg.groupingExpressions.map(_.asInstanceOf[Attribute])
        // phase 1: the original aggregate functions keyed on (keys, salt)
        val partials = agg.aggregateExpressions.collect {
          case orig @ Alias(ae: AggregateExpression, name) =>
            orig.exprId -> Alias(ae, name + partialSuffix)()
        }.toMap
        val phase1 = Aggregate(
          groupAttrs :+ salt.toAttribute,
          groupAttrs ++ partials.values.toSeq,
          Project(agg.child.output :+ salt, agg.child),
          None)
        // phase 2: combine the partials per key, keeping the original
        // output names, expression ids, types, and nullability
        val finals = agg.aggregateExpressions.map {
          case a: AttributeReference => a
          case al @ Alias(a: AttributeReference, name) =>
            Alias(a, name)(al.exprId)
          case al @ Alias(ae: AggregateExpression, name) =>
            val p = partials(al.exprId).toAttribute
            def comb(fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction) =
              AggregateExpression(fn, Complete, isDistinct = false, filter = None)
            val combined = ae.aggregateFunction match {
              // count partials are never null, so the coalesce only
              // restores count's non-nullable result type
              case _: Count => Coalesce(Seq(comb(Sum(p)), Literal(0L, LongType)))
              case _: Sum => comb(Sum(p))
              case _: Min => comb(Min(p))
              case _: Max => comb(Max(p))
              case other => throw new IllegalStateException(
                s"non-combinable aggregate slipped eligibility: $other")
            }
            Alias(combined, name)(al.exprId)
          case other => throw new IllegalStateException(
            s"non-eligible output slipped eligibility: $other")
        }
        Aggregate(groupAttrs.toSeq, finals, phase1, None)
    }
  }
}
