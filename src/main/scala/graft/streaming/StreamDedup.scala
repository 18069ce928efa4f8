package graft.streaming

import graft.functions.TextFunctions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-stream exact deduplication with BOUNDED state — the ingest-time
  * dedup stage of a streaming training-data pipeline.
  *
  * `dropDuplicatesWithinWatermark` keys the state store on the dedup
  * columns and evicts entries once the watermark passes their event
  * time + delay: state is O(keys per watermark window), not O(all keys
  * ever seen) — the property that keeps a forever-running ingest
  * stream alive at 100 TB/day. The trade (inherent to watermarked
  * dedup, not this wrapper): duplicates separated by MORE than the
  * watermark delay can re-emit; size the delay to the source's
  * realistic duplication window (e.g. producer-retry horizon).
  */
object StreamDedup {

  /** Drop in-stream duplicates of the given key columns. */
  def byKeys(
      events: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      delay: String): DataFrame =
    events
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Drop in-stream CONTENT duplicates: dedup on the canonical-form
    * fingerprint of `textCol` (same fingerprint as the batch
    * [[graft.operators.TextDedup.exactClusters]], so stream-side and
    * batch-side exact dedup agree on what "duplicate" means).
    */
  def byFingerprint(
      events: DataFrame,
      textCol: String,
      eventTimeCol: String,
      delay: String): DataFrame = {
    val fp = "__graft_fp"
    events
      .withColumn(fp, TextFunctions.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(fp :: Nil)
      .drop(fp)
  }
}
