package graft.ops

import java.lang.ref.SoftReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-(SparkSession, key) memo for frames that are expensive to build
  * and shared across operators (dd06's converged cluster frame, the
  * ss22/ss24 walk beam). Replaces the round-8 ConcurrentHashMap keyed
  * by (session, key), which had two defects (ADVICE r8):
  *
  *  - **Session retention**: a strong (session, key) key pinned every
  *    discarded session (tests and artifact readers call
  *    `spark.newSession()` freely) plus its checkpoint-backed frames
  *    for the process lifetime. Here the session key is WEAK (outer
  *    `WeakHashMap`) and the value is held via `SoftReference` — a
  *    memoized DataFrame strongly references its own session, so a
  *    strong value would defeat the weak key (the documented
  *    WeakHashMap caveat). Once a session is discarded, its entry
  *    unpins on GC and the ContextCleaner reclaims the frame's
  *    storage blocks; under heap pressure soft values go first.
  *  - **Lock scope**: `CHM.compute` held the bin lock for the whole
  *    multi-job convergence loop, blocking unrelated callers that
  *    hashed to the same bin. `getOrCompute` runs the compute OUTSIDE
  *    every lock; a race costs one redundant build (benign — both
  *    results are equivalent, last put wins), never a stall.
  */
final class SessionMemo[V <: AnyRef] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, SoftReference[V]]]()

  private def mapFor(s: SparkSession): ConcurrentHashMap[String, SoftReference[V]] =
    bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) {
        m = new ConcurrentHashMap[String, SoftReference[V]]()
        bySession.put(s, m)
      }
      m
    }

  /** Serve the memoized value while `live` holds; (re)compute outside
    * any lock otherwise. */
  def getOrCompute(s: SparkSession, key: String)(live: V => Boolean)(
      compute: => V): V = {
    val m = mapFor(s)
    val ref = m.get(key)
    val cur = if (ref == null) null.asInstanceOf[V] else ref.get()
    if (cur != null && live(cur)) cur
    else {
      val v = compute
      m.put(key, new SoftReference(v))
      v
    }
  }

  /** Entry count for the session (spec hook). */
  private[graft] def size(s: SparkSession): Int =
    bySession.synchronized {
      val m = bySession.get(s)
      if (m == null) 0 else m.size()
    }
}
