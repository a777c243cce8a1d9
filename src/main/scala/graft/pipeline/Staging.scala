package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for the compact STAGING caches some operators
  * keep alive (tf tables, bigram counts, distinct (term, source) pairs —
  * always vocabulary-sized, never corpus-sized). The cache must outlive
  * the operator call: the returned DataFrame is lazy and the staged
  * table is consumed by more than one downstream branch, so the operator
  * cannot unpersist it itself. Without a registry those persists are
  * unreachable to the caller and accumulate over a long-lived session
  * (a bench loop, a notebook): [[unstageAll]] is the explicit eviction
  * point — call it between queries, or after the results of a staged
  * operator have been fully materialized.
  *
  * Holding the frames strongly until eviction is the point (a weak ref
  * could be collected while its cache entry lives on in the
  * CacheManager, stranding the storage); the frames themselves are just
  * plan objects, a few KB each.
  *
  * EVICTION IS PROCESS-GLOBAL: the registry is a JVM singleton, so
  * [[unstageAll]] evicts EVERY registered cache, including staging
  * tables of operators still mid-execution on other threads of a shared
  * SparkSession (an HTTP server racing a bench loop). That is safe —
  * Spark transparently recomputes an evicted cache — but it is a
  * performance cliff, not a no-op, for the concurrent caller. Call it
  * only at quiescent points you own (between bench passes, end of a
  * notebook cell); concurrent multi-tenant use of one session would
  * need a per-caller handle, which this deliberately does not provide.
  */
object Staging {
  private val staged = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for later eviction. */
  def stage(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    staged += p
    p
  }

  /** Evict every registered staging cache (non-blocking unpersist). */
  def unstageAll(): Unit = synchronized {
    staged.foreach(_.unpersist(false))
    staged.clear()
  }

  /** Number of currently registered staging caches (spec hook). */
  def stagedCount: Int = synchronized(staged.size)
}
