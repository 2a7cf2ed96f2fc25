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
 */
private[ext] object Caches {

  private val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def track(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    persisted += p
    p
  }

  /** Record an already-persisted frame for release by [[unpersistAll]]. */
  def register(df: DataFrame): DataFrame = synchronized { persisted += df; df }

  def unpersistAll(): Unit = synchronized {
    persisted.foreach(_.unpersist(blocking = false))
    persisted.clear()
  }
}
