package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated}

/** Storage-pressure evidence for the Bench contract line (two
  * consecutive rounds' headline numbers were inflated by co-tenant
  * memory pressure that CacheScope's call-profile could not see: same
  * code, same 178:120 profile, 3× the CPU burn from evict→recompute
  * thrash). Two counters, both from block-status updates:
  *
  *  - `drops`: an RDD block updated to an INVALID storage level while
  *    its RDD is STILL marked persistent — the memory store gave the
  *    block up under pressure. The persistence check excludes the
  *    benign removal path (explicit unpersist / ContextCleaner
  *    reclaiming unreachable truncated RDDs de-registers the RDD
  *    before/as its blocks drop), so an idle sweep reads 0 even while
  *    the cleaner is active.
  *  - `demotions`: an RDD block written or rewritten DISK-ONLY (level
  *    valid, useDisk, !useMemory). MEMORY_AND_DISK caches — `cache()`
  *    and localCheckpoint defaults — never report invalid levels under
  *    memory pressure; they fall to disk. A thrashing box therefore
  *    shows demotions ≫ 0 with drops possibly 0; a healthy one shows
  *    0/0.
  */
class EvictionMonitor private (sc: SparkContext) {
  val drops = new AtomicLong
  val demotions = new AtomicLong

  private val listener = new SparkListener {
    override def onBlockUpdated(u: SparkListenerBlockUpdated): Unit = {
      val info = u.blockUpdatedInfo
      val rddId = info.blockId.asRDDId.map(_.rddId)
      if (rddId.isDefined) {
        val lvl = info.storageLevel
        if (!lvl.isValid) {
          // still-persistent ⇒ pressure, not cleanup (the map is
          // |persistent RDDs|-sized and read on the listener thread)
          if (sc.getPersistentRDDs.contains(rddId.get))
            drops.incrementAndGet(): Unit
        } else if (lvl.useDisk && !lvl.useMemory) {
          demotions.incrementAndGet(): Unit
        }
      }
    }
  }
  sc.addSparkListener(listener)
}

object EvictionMonitor {
  /** Attach a storage-pressure listener to `sc`. */
  def attach(sc: SparkContext): EvictionMonitor = new EvictionMonitor(sc)
}
