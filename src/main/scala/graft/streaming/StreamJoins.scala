package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming temporal joins with BOUNDED state — the stream-side
  * variants of [[graft.operators.RangeJoin]] and
  * [[graft.operators.AsOfJoin]].
  *
  * Both operators ride Spark's native stream-stream join state
  * management: each side is watermarked, and the join condition bounds
  * each side's event time from BOTH directions relative to the other
  * side, so the state store evicts rows as the watermark advances —
  * state is O(rows per watermark window), never O(stream history). The
  * explicit horizon/max-length parameters are not a wrapper quirk: an
  * UNBOUNDED interval join cannot clean its state on any engine, so at
  * 100 TB/day the bound is the difference between a pipeline and a
  * memory leak.
  */
object StreamJoins {

  /** Stream-stream point-in-interval join: each event joins every
    * interval row (same keys) whose [start, end] contains the event
    * time.
    *
    * @param maxIntervalLength Spark interval literal body (e.g.
    *        "1 hour"): an upper bound on end - start, enforced by the
    *        join condition itself (an interval longer than the bound
    *        only matches events in its first `maxIntervalLength`). It
    *        gives the planner the `event_time <= start + bound`
    *        conjunct that makes interval-side state evictable.
    * @param joinType "inner", or "left_outer" to also emit events that
    *        fall in no interval (null interval columns) — emitted once
    *        the watermark proves no matching interval can still arrive.
    */
  def pointInInterval(
      events: DataFrame,
      eventTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keyCols: Seq[String],
      eventDelay: String,
      intervalDelay: String,
      maxIntervalLength: String,
      joinType: String = "inner"): DataFrame = {
    val e = events.withWatermark(eventTime, eventDelay).alias("e")
    val i = intervals.withWatermark(startCol, intervalDelay).alias("i")
    val timeCond =
      col(s"i.$startCol") <= col(s"e.$eventTime") &&
        col(s"e.$eventTime") <= col(s"i.$endCol") &&
        col(s"e.$eventTime") <= col(s"i.$startCol") + expr(s"interval $maxIntervalLength")
    val cond = keyCols.foldLeft(timeCond)((c, k) => c && col(s"e.$k") === col(s"i.$k"))
    keyCols.foldLeft(e.join(i, cond, joinType))((d, k) => d.drop(col(s"i.$k")))
  }

  /** As-of-WITHIN-HORIZON candidate rows: for each event, every update
    * (same keys) with update time in (event time - horizon, event
    * time]. The as-of WINNER — the single latest update per event — is
    * a latest-per-key dedup over these candidates, which is exactly
    * what this engine's micro-batch merge sink already does
    * ([[graft.operators.CdcDedup.latestPerKey]] ordered by the update
    * time): run the candidates through `foreachBatch` + merge and the
    * target converges to true as-of rows, idempotently across replays.
    *
    * The horizon is the semantic price of bounded state: an event whose
    * nearest preceding update is OLDER than the horizon gets no row
    * (downstream treats it as "no dimension value"), because matching
    * it would require keeping every update forever.
    *
    * @param joinType "inner", or "left_outer" to keep dimension-less
    *        events as null-extended rows (emitted once the watermark
    *        closes their horizon).
    */
  def asOfCandidates(
      events: DataFrame,
      eventTime: String,
      updates: DataFrame,
      updateTime: String,
      keyCols: Seq[String],
      eventDelay: String,
      updateDelay: String,
      horizon: String,
      joinType: String = "inner"): DataFrame = {
    val e = events.withWatermark(eventTime, eventDelay).alias("e")
    val u = updates.withWatermark(updateTime, updateDelay).alias("u")
    val timeCond =
      col(s"u.$updateTime") <= col(s"e.$eventTime") &&
        col(s"u.$updateTime") > col(s"e.$eventTime") - expr(s"interval $horizon")
    val cond = keyCols.foldLeft(timeCond)((c, k) => c && col(s"e.$k") === col(s"u.$k"))
    keyCols.foldLeft(e.join(u, cond, joinType))((d, k) => d.drop(col(s"u.$k")))
  }
}
