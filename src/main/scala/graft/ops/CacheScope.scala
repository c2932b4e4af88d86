package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for the caches plan builders create (shingle tables,
  * near-dup edge lists, centroid tables). Each `cached(df)` call both
  * caches the frame and records it, so a harness — or a long-lived
  * service — can `unpersistAll()` once a request's results are
  * materialized instead of pinning corpus-derived frames in storage
  * memory forever. Verify drains the scope after every query; Bench
  * deliberately keeps caches warm across queries (a warm-service
  * profile — cross-query reuse of e.g. the shingle table is the
  * behavior being measured).
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private[graft] def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    live.add(c)
    c
  }

  /** Unpersist every frame cached since the last drain. Safe to call
    * while results derived from the caches are still referenced —
    * Spark recomputes from lineage if re-executed. */
  def unpersistAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist()
      df = live.poll()
    }
  }
}
