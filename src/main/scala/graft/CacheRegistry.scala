package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for DataFrames the library persists internally (dedup posting
  * lists, pivot inputs, pipeline scans), so batch entry points can release
  * exactly what the library cached — instead of `spark.catalog.clearCache()`
  * nuking the user's own cached data, and instead of leaking a cache entry
  * per operator invocation over a long session (the cache manager frees
  * nothing until session end on its own).
  */
object CacheRegistry {

  private val frames =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())

  /** Persist `df` (MEMORY_AND_DISK: spill, never OOM) and track it. */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    frames.add(df)
    df
  }

  /** Unpersist everything the library has persisted since the last release.
    * Drains atomically (snapshot + clear under the list's lock), so a
    * concurrent `persist` is either released now or stays tracked — never
    * silently dropped from tracking while still cached.
    *
    * Scope note: the registry is JVM-global. Batch entry points call this
    * after consuming their own results; if two pipelines share one session
    * concurrently, a release by one unpersists the other's intermediates —
    * correctness is unaffected (frames recompute), only the reuse is lost.
    * Scope releases to quiesced points in that scenario.
    */
  def releaseAll(): Unit = {
    val snapshot = frames.synchronized {
      val copy = new java.util.ArrayList[DataFrame](frames)
      frames.clear()
      copy
    }
    // BLOCKING unpersist: async removal (blocking = false) defers the
    // block-manager work into whatever runs NEXT — measured in round 13
    // as a reproducible ~2 s inflation of the first persist-heavy query
    // following a store-lifecycle query in a shared session (q38 after
    // q196: 4.1 s vs 2.2 s). A release point is a quiesce point by
    // contract (the caller has consumed its results), so paying the
    // removal HERE attributes the cost to its owner and hands the next
    // query a clean block manager.
    snapshot.forEach(df => { df.unpersist(true); () })
  }

  /** Number of tracked persisted frames (observability / tests). */
  def trackedCount: Int = frames.size()
}
