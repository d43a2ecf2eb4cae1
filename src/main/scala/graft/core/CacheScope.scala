package graft.core

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** Registry for query-scoped caches.
  *
  * Operators that cache an intermediate reused within one query (shingle
  * tables, fingerprints, candidate sets) register it here instead of
  * calling `.cache()` directly; the harness (Bench / Verify / a serving
  * loop) calls [[release]] once the query's action completes. Without
  * this, a multi-query session accumulates every operator's working set
  * in executor storage — at 100 TB that is an OOM, and even locally the
  * eviction pressure was the dominant slowdown in multi-query benchmarks.
  *
  * Long-lived structures (derived plug tables, ANN indexes) deliberately
  * bypass this and manage their own lifecycle.
  */
object CacheScope {
  private val live = ArrayBuffer[DataFrame]()

  /** Cache `df` and register it for the next [[release]]. */
  def cached(df: DataFrame): DataFrame = synchronized {
    val c = df.cache()
    live += c
    c
  }

  /** Register an already-persisted frame (e.g. an eager localCheckpoint)
    * whose storage should be freed at query end.
    */
  def register(df: DataFrame): DataFrame = synchronized { live += df; df }

  /** Unpersist every registered frame (non-blocking) and clear the scope.
    * Frees both CacheManager entries (`.cache()`) and the block-manager
    * storage of eager localCheckpoints.
    */
  def release(): Unit = synchronized {
    live.foreach { df =>
      df.unpersist(false)
      org.apache.spark.sql.GraftBridge.freeCheckpoint(df)
    }
    live.clear()
  }
}
