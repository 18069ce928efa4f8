package graft.util

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Session-scoped keyed cache for expensive staged computations that
  * are shared across queries (LSH candidate stages, IVF indexes).
  *
  * Entries are keyed `applicationId:key` and typically hold persisted
  * DataFrames whose cached blocks die with their session, so entries
  * are evicted when the owning application ends
  * (SparkListener.onApplicationEnd) — a long-lived JVM hosting many
  * sequential sessions cannot accumulate entries for dead applications.
  */
private[graft] class SessionScopedCache[T] {

  private val cache = TrieMap.empty[String, T]
  private val hooked = TrieMap.empty[String, Boolean]

  def getOrElseUpdate(s: SparkSession, key: String)(make: => T): T = {
    hook(s)
    cache.getOrElseUpdate(s"${s.sparkContext.applicationId}:$key",
      { SessionScopedCache.misses.incrementAndGet(); make })
  }

  /** Imperative variants for caches maintained at write time rather
    * than built lazily (e.g. the merge schema cache).
    */
  def put(s: SparkSession, key: String, value: T): Unit = {
    hook(s)
    cache.put(s"${s.sparkContext.applicationId}:$key", value)
    ()
  }

  def get(s: SparkSession, key: String): Option[T] =
    cache.get(s"${s.sparkContext.applicationId}:$key")

  def remove(s: SparkSession, key: String): Unit = {
    cache.remove(s"${s.sparkContext.applicationId}:$key")
    ()
  }

  private def hook(s: SparkSession): Unit = {
    val appId = s.sparkContext.applicationId
    hooked.getOrElseUpdate(appId, {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = evict(appId)
      })
      true
    })
    ()
  }

  private[graft] def evict(appId: String): Unit = {
    cache.filterInPlace((k, _) => !k.startsWith(appId + ":"))
    hooked.remove(appId)
    ()
  }

  private[graft] def entryCount: Int = cache.size
}

private[graft] object SessionScopedCache {
  /** Global build (cache-miss) counter across every stage cache in the
    * process: the bench snapshots it around each rep so a query whose
    * warm reps answer from session-staged state is LABELED as such in
    * the emitted JSON — warm `queries_min` timings for those queries
    * measure the serve path, not the staged build, and cross-round
    * comparisons must pair them with the `queries_cold` column.
    */
  private[graft] val misses = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def totalMisses: Long = misses.get()
}
