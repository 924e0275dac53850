package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Keyed persist-with-replacement for computed intermediates that a
  * downstream plan references more than once (a feature table feeding an
  * ANN search, the exploded shingle set feeding both MinHash stages).
  *
  * `persist()` entries live in the session CacheManager until explicitly
  * released — the ContextCleaner never reclaims them — so a library
  * function that persists on every call leaks its heaviest intermediate
  * for the session lifetime. `swap` bounds that to one live cache per
  * key: the previous holder is unpersisted when a new one arrives. At
  * cluster scale the same seam is where a parquet checkpoint goes.
  */
object CacheOnce {
  private val live = scala.collection.mutable.Map.empty[String, DataFrame]

  def swap(key: String, df: DataFrame,
           level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      live.remove(key).foreach(_.unpersist())
      val cached = df.persist(level)
      live(key) = cached
      cached
    }
}
