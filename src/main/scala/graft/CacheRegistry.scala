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
    * Non-blocking; safe to call between pipeline stages or per batch.
    */
  def releaseAll(): Unit = {
    frames.forEach(df => { df.unpersist(false); () })
    frames.clear()
  }

  /** Number of tracked persisted frames (observability / tests). */
  def trackedCount: Int = frames.size()
}
