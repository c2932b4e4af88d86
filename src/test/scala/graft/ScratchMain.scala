package graft

import org.apache.spark.sql.SparkSession

/** Throwaway driver for iterating on single operators (not a test). */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime
      val rows = SparkEntry.queries(name)(spark, d).collect()
      println(s"SCRATCH $name rows=${rows.length} time=${(System.nanoTime - t0) / 1e9}")
      rows.take(3).foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
