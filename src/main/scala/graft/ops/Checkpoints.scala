package graft.ops

import org.apache.spark.sql.DataFrame

/** Per-round lineage truncation for the iterative kernels (pagerank /
  * k-core / BFS / min-label components). Default is a LAZY
  * `localCheckpoint` — no extra job, flat plan string — but its blocks
  * are executor-local and unreplicated: on a preemptible cluster an
  * executor loss makes the truncated lineage unrecoverable and fails
  * the job. Setting `spark.graft.checkpointDir` to a reliable
  * filesystem path (HDFS/S3) switches every per-round truncation to a
  * lazy RELIABLE `checkpoint()` into that directory, which survives
  * executor loss at the cost of one write per round — the right trade
  * on a 100 TB preemptible fleet, and the wrong default for local
  * iteration, hence opt-in.
  */
object Checkpoints {
  private[graft] def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir")
      .filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = false)
      case None =>
        val out = df.localCheckpoint(eager = false)
        // register the checkpoint-backed RDD with the drain scope:
        // local-checkpoint blocks otherwise free only when the
        // ContextCleaner notices plan unreachability (GC-dependent),
        // and a long-lived driver with a lazy heap would pin storage
        // across back-to-back queries
        out.queryExecution.analyzed.foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            CacheScope.registerRdd(l.rdd)
          case _ =>
        }
        out
    }
  }

  /** `df.truncated` — the per-round truncation point in kernel code. */
  private[graft] implicit class TruncateOps(private val df: DataFrame)
    extends AnyVal {
    def truncated: DataFrame = truncate(df)
  }
}
