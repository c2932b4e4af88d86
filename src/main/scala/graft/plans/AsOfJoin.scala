package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for every left row, attach the latest right row
  * of the same key with `rightTs` strictly earlier than `leftTs`
  * (left-outer semantics — unmatched left rows get nulls).
  *
  * Spark has no such operator; per the preference order this is the
  * full case-(c) integration: logical node → planner strategy →
  * physical `BinaryExecNode`. The physical plan REQUIRES clustering on
  * the key and (key, ts) ordering from both children — Catalyst's
  * EnsureRequirements inserts the exchanges/sorts — and then runs a
  * single streaming merge-scan per partition: O(n+m) per partition,
  * O(1) state (one buffered build row), no per-key materialization.
  * That is the shape that survives 100 TB: one shuffle each side,
  * nothing quadratic, nothing collected.
  *
  * Key and ts expressions must be fixed-width numeric/timestamp types
  * (extracted as longs through an UnsafeProjection).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    toleranceUs: Long = Long.MaxValue) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    toleranceUs: Long = Long.MaxValue) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKey = leftKey; val lTs = leftTs; val rKey = rightKey; val rTs = rightTs
    val tol = toleranceUs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lKey, lTs), leftOut)
      val rProj = UnsafeProjection.create(Seq(rKey, rTs), rightOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      var lastMatchTs = 0L
      lIter.map { lRow =>
        val lkt = lProj(lRow)
        val k = lkt.getLong(0)
        val t = lkt.getLong(1)
        var scanning = true
        while (scanning && rHead != null) {
          val rkt = rProj(rHead)
          val rk = rkt.getLong(0)
          val rt = rkt.getLong(1)
          if (rk < k || (rk == k && rt < t)) {
            if (rk == k) { lastMatch = rHead.copy(); lastMatchKey = rk; lastMatchTs = rt }
            rHead = if (rIter.hasNext) rIter.next() else null
          } else scanning = false
        }
        // the buffered match must also be recent enough: t - lastMatchTs
        // is non-negative (strictly-earlier), so no overflow
        val rightPart =
          if (lastMatch != null && lastMatchKey == k && t - lastMatchTs <= tol)
            lastMatch else nullRight
        resultProj(joined(lRow, rightPart))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tol) :: Nil
    case _ => Nil
  }
}

/** Public entry point for the native as-of join. */
object AsOf {
  /** `left` and `right` must come from independent reads (fresh
    * attribute ids); key/ts columns are referenced by name.
    * `toleranceUs` (microseconds) bounds how stale the matched right
    * row may be (the merge-asof `tolerance` notion): matches older
    * than `leftTs - toleranceUs` become nulls. Default: unbounded. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String,
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute = {
      val a = p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
      // the exec extracts key/ts via getLong — fail fast on anything that
      // is not an 8-byte type rather than silently mis-joining (e.g. an
      // IntegerType key read without sign extension)
      a.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => a
        case dt => throw new IllegalArgumentException(
          s"as-of join column $n must be LONG/TIMESTAMP (8-byte), got $dt")
      }
    }
    org.apache.spark.sql.graft.GraftDataset.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(lp, leftTs),
        attr(rp, rightKey), attr(rp, rightTs), toleranceUs))
  }
}
