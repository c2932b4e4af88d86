package graft

import org.apache.spark.SparkConf
import org.apache.spark.SparkContext
import org.apache.spark.storage.StorageLevel

/** Dev probe for the Bench contract's storage-pressure counters: a
  * session whose memory manager is deliberately starved
  * (`spark.testing.memory`), two MEMORY_ONLY caches that cannot
  * co-reside, one MEMORY_AND_DISK cache that must demote — the
  * positive signature (drops > 0, demotions > 0) EvictionMonitor
  * promises under pressure, plus the negative control (an explicit
  * unpersist of a live cache counts as NEITHER, because the RDD is
  * de-registered as its blocks drop — the ContextCleaner path a warm
  * Bench sweep exercises constantly). Runs in its own JVM because a
  * memory-starved SparkContext is process-global. */
object EvictionProbeMain {
  def main(args: Array[String]): Unit = {
    val conf = new SparkConf().setMaster("local[4]")
      .setAppName("eviction-probe")
      .set("spark.ui.enabled", "false")
      // ~512 MB visible to the memory manager → ~140 MB storage pool
      .set("spark.testing.memory", (512L << 20).toString)
    val sc = new SparkContext(conf)
    sc.setLogLevel("ERROR")
    val mon = graft.ops.EvictionMonitor.attach(sc)

    def mb(n: Int, seed: Int) = sc.parallelize(0 until n, 4)
      .map(i => Array.fill(1 << 20)((i + seed).toByte))

    // negative control FIRST (clean counters): a modest cache fully
    // materialized then explicitly unpersisted must count nothing
    val ctrl = mb(8, 99).persist(StorageLevel.MEMORY_ONLY)
    ctrl.count()
    ctrl.unpersist(blocking = true)
    Thread.sleep(1000) // let trailing block events drain
    val dropsAfterCtrl = mon.drops.get
    val demoteAfterCtrl = mon.demotions.get

    // pressure: two 100 MB MEMORY_ONLY caches in a ~140 MB pool — the
    // second evicts the first's still-persistent blocks
    val a = mb(100, 0).persist(StorageLevel.MEMORY_ONLY)
    a.count()
    val b = mb(100, 1).persist(StorageLevel.MEMORY_ONLY)
    b.count()
    // demotion: the pressure VICTIM must itself be MEMORY_AND_DISK —
    // c1 materializes into memory (evicting b's MEMORY_ONLY blocks,
    // which just drop), then c2's arrival pushes c1's blocks to disk
    val c1 = mb(100, 2).persist(StorageLevel.MEMORY_AND_DISK)
    c1.count()
    val c2 = mb(100, 3).persist(StorageLevel.MEMORY_AND_DISK)
    c2.count()
    Thread.sleep(1000)
    val drops = mon.drops.get - dropsAfterCtrl
    val demotions = mon.demotions.get - demoteAfterCtrl
    println(s"EVICTPROBE ctrl_drops=$dropsAfterCtrl " +
      s"ctrl_demotions=$demoteAfterCtrl drops=$drops demotions=$demotions " +
      s"verdict=${if (dropsAfterCtrl == 0 && drops > 0 && demotions > 0) "OK"
        else "FAIL"}")
    sc.stop()
  }
}
