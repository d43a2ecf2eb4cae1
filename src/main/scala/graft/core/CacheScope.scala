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
  private val cachedFrames = ArrayBuffer[DataFrame]()
  private val checkpointFrames = ArrayBuffer[DataFrame]()

  /** Cache `df` and register it for the next [[release]]. */
  def cached(df: DataFrame): DataFrame = synchronized {
    val c = df.cache()
    cachedFrames += c
    c
  }

  /** Register an already-persisted frame (e.g. an eager localCheckpoint)
    * whose storage should be freed at query end.
    */
  def register(df: DataFrame): DataFrame = synchronized {
    checkpointFrames += df; df
  }

  /** Number of frames currently registered in the scope — lets a harness
    * detect whether building a query registered scoped caches (such a
    * query must be re-built per execution so its registrations line up
    * with the harness's release() calls; see graft.Bench's prepared-plan
    * reuse).
    */
  def scopedCount: Int = synchronized { cachedFrames.size + checkpointFrames.size }

  /** Unpersist every registered frame (non-blocking) and clear the scope.
    *
    * Checkpoint-block freeing applies ONLY to frames that came in through
    * [[register]] (known eager checkpoints owned by this scope): a
    * [[cached]] frame's plan may EMBED someone else's long-lived
    * localCheckpoint (e.g. a scoped cache built on nearDupClusters'
    * lineage-truncated labels), and freeing every LogicalRDD found in an
    * arbitrary plan would yank the parent's storage out from under it,
    * making the long-lived frame permanently unusable.
    */
  def release(): Unit = synchronized {
    cachedFrames.foreach(_.unpersist(false))
    checkpointFrames.foreach { df =>
      df.unpersist(false)
      org.apache.spark.sql.GraftBridge.freeCheckpoint(df)
    }
    cachedFrames.clear()
    checkpointFrames.clear()
  }
}
