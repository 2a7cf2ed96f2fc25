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
private[graft] object Caches {

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

  /** The RDD actually holding a localCheckpoint's blocks. `Dataset
    * .unpersist` on a checkpointed frame is a NO-OP — it goes through the
    * CacheManager while the checkpoint persists at the RDD level — so
    * releasing one means unpersisting the `LogicalRDD` leaf's RDD. */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Eagerly release a frame produced by [[trackCheckpoint]] (or any bare
    * `localCheckpoint()`) — the release path iterative builders use when
    * they collapse lineage round over round. */
  def releaseCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))

  /** Eager `localCheckpoint` tracked for REAL release by [[unpersistAll]]:
    * materializes the frame once and replaces its plan with a leaf
    * `LogicalRDD`, so downstream re-plans (iterative-trainer steps, probe
    * loops) stop paying per-iteration analysis of the full build lineage. */
  def trackCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ckBuf += ck
    ck
  }

  /** Record an ALREADY-checkpointed frame for release by [[unpersistAll]] —
    * for iterative builders that truncate lineage round over round, release
    * dead rounds eagerly themselves, and need only the surviving final
    * round covered ([[releaseCheckpoint]] is idempotent, so a frame both
    * released manually and registered here is safe). */
  def registerCheckpoint(df: DataFrame): DataFrame = { ckBuf += df; df }

  private val checkpointed =
    new java.util.concurrent.ConcurrentHashMap[Long, scala.collection.mutable.ArrayBuffer[DataFrame]]()

  private def ckBuf = checkpointed.computeIfAbsent(
    Thread.currentThread().getId, _ => scala.collection.mutable.ArrayBuffer.empty[DataFrame])

  /** Release the caches tracked by the CALLING thread (see class doc). */
  def unpersistAll(): Unit = {
    val b = persisted.remove(Thread.currentThread().getId)
    if (b != null) b.foreach(_.unpersist(blocking = false))
    val c = checkpointed.remove(Thread.currentThread().getId)
    if (c != null) c.foreach(releaseCheckpoint)
  }

  /** Release every thread's caches — session-teardown / test-suite cleanup
    * only; defeats the per-thread isolation if called mid-flight. */
  def unpersistEverything(): Unit = {
    val it = persisted.keys()
    while (it.hasMoreElements) {
      val b = persisted.remove(it.nextElement())
      if (b != null) b.foreach(_.unpersist(blocking = false))
    }
    val ck = checkpointed.keys()
    while (ck.hasMoreElements) {
      val c = checkpointed.remove(ck.nextElement())
      if (c != null) c.foreach(releaseCheckpoint)
    }
  }
}
