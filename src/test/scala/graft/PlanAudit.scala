package graft

import org.apache.spark.sql.SparkSession

/** One-off plan audit: formatted physical plans for named queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    for (name <- args.drop(1)) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      // summarize: operator histogram + red flags
      val ops = plan.linesIterator.flatMap(l =>
        "\\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin|Exchange hashpartitioning|Exchange SinglePartition|Window|HashAggregate|ObjectHashAggregate|SortAggregate|FileScan|InMemoryTableScan)\\b".r
          .findAllIn(l)).toSeq
      ops.groupBy(identity).toSeq.sortBy(-_._2.size).foreach { case (o, n) =>
        println(f"  ${n.size}%3d  $o") }
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters: [")).map(_.trim.take(140)).toSeq.distinct
      pushed.take(4).foreach(p => println(s"  $p"))
    }
    spark.stop()
  }
}
