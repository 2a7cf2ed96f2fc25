package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Registry of frames persisted by extension plan builders (dedup shingle
 * sets, blocked pair inputs, iterative component labels). The builders are
 * lazy — the caller decides when the plan executes — so they cannot
 * unpersist their caches themselves; consumers (Bench/Verify/pipelines)
 * call [[unpersistAll]] after consuming each query so caches never leak
 * across queries in a shared session.
 *
 * The registry is keyed by the REGISTERING THREAD: [[unpersistAll]] releases
 * only the caches tracked by the calling thread, so concurrent queries in a
 * shared session (one per thread — the standard parallel-harness shape, e.g.
 * `Runner`'s parallel dims or overlapping harness queries) cannot release
 * each other's in-flight caches and silently force recomputation of the
 * persisted subtrees. A query whose BUILD and CONSUME+FLUSH straddle threads
 * must flush from the building thread (or use [[unpersistEverything]] at
 * session teardown, which releases all threads' caches).
 */
private[ext] object Caches {

  private val persisted =
    new java.util.concurrent.ConcurrentHashMap[Long, scala.collection.mutable.ArrayBuffer[DataFrame]]()

  private def buf = persisted.computeIfAbsent(
    Thread.currentThread().getId, _ => scala.collection.mutable.ArrayBuffer.empty[DataFrame])

  def track(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    buf += p
    p
  }

  /** Record an already-persisted frame for release by [[unpersistAll]]. */
  def register(df: DataFrame): DataFrame = { buf += df; df }

  /** Release the caches tracked by the CALLING thread (see class doc). */
  def unpersistAll(): Unit = {
    val b = persisted.remove(Thread.currentThread().getId)
    if (b != null) b.foreach(_.unpersist(blocking = false))
  }

  /** Release every thread's caches — session-teardown / test-suite cleanup
    * only; defeats the per-thread isolation if called mid-flight. */
  def unpersistEverything(): Unit = {
    val it = persisted.keys()
    while (it.hasMoreElements) {
      val b = persisted.remove(it.nextElement())
      if (b != null) b.foreach(_.unpersist(blocking = false))
    }
  }
}
