package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-lifecycle hygiene. Operators that materialize a shared
  * intermediate (shingle tables, routed merge batches) must not leak one
  * cache entry per invocation, and re-deriving the same plan must not
  * re-register it (Spark's CacheManager logs "Asked to cache already
  * cached data" and keeps the first entry).
  */
object Caches {

  /** Persist `df` unless an equivalent plan is already cached — repeated
    * invocations of the same operator share the existing entry instead of
    * warning. (`Dataset.storageLevel` consults the session CacheManager
    * by canonicalized plan, so this sees caches registered by any prior
    * DataFrame with the same plan.) */
  def ensureCached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df
}
