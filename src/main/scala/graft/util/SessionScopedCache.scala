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
    val appId = s.sparkContext.applicationId
    hooked.getOrElseUpdate(appId, {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = evict(appId)
      })
      true
    })
    cache.getOrElseUpdate(s"$appId:$key", make)
  }

  private[graft] def evict(appId: String): Unit = {
    cache.filterInPlace((k, _) => !k.startsWith(appId + ":"))
    hooked.remove(appId)
    ()
  }

  private[graft] def entryCount: Int = cache.size
}
