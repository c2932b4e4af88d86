package graft

import org.apache.spark.sql.SparkSession

/** Robustness sweep: run EVERY SparkEntry query against a zero-row
  * corpus (same schemas) and report crashes. Empty inputs are a real
  * production condition — a filter that drops everything, a new
  * partition, a cold ingest day — and an operator that throws on them
  * fails the whole job at scale. */
object EmptySweepMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/graft-empty-sf")
    var bad = List.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, d).count()
        println(s"EMPTYSWEEP ok $name rows=$n")
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString
          bad ::= (name, msg)
          println(s"EMPTYSWEEP FAIL $name: $msg")
      }
      graft.ops.CacheScope.unpersistAll()
    }
    println(s"EMPTYSWEEP done failures=${bad.size}")
    bad.reverse.foreach { case (n, m) => println(s"EMPTYSWEEP summary $n: $m") }
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
