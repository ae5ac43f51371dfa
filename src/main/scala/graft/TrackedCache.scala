package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The persist-and-release lifecycle shared by operators that cache a
  * frame their plan references multiple times (sketches, lexical
  * indexes, per-key profiles): persist MEMORY_AND_DISK so an oversized
  * frame spills instead of silently recomputing per reference, track it
  * for an explicit release call, and self-prune the tracking queue so a
  * session that releases via `spark.catalog.clearCache()` instead (Bench
  * does) never accumulates strong refs — entries whose storage level
  * dropped to NONE are already released and fall out here, bounding the
  * queue by the number of LIVE cached frames.
  *
  * One instance per operator object ([[graft.dedup.NearDedup]],
  * [[graft.search.Lexical]], [[graft.operators.Profiling]]) so each
  * keeps its own release scope.
  */
private[graft] final class TrackedCache {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (when `reuse`) and track it for [[releaseAll]]. */
  def reused(df: DataFrame, reuse: Boolean = true): DataFrame =
    if (reuse) {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked.removeIf(d => d.storageLevel == StorageLevel.NONE)
      tracked.add(p)
      p
    } else df

  /** Unpersist every tracked frame (non-blocking). Call after the
    * consuming action — results remain valid, they just recompute if
    * re-run. Scope-global: do not call concurrently with an in-flight
    * pass whose frames it would release mid-query.
    */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(blocking = false); df = tracked.poll() }
  }
}
