package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-static enrichment: join a change-event stream against a
  * static dimension table (the classic "attach customer attributes to
  * the event stream" step). Spark plans stream-static joins statelessly
  * — each micro-batch probes the dimension — so the only scale decision
  * is HOW the probe runs:
  *
  *  - `broadcast = true` (default): the dimension rides a broadcast
  *    hash join. Right for true dimensions (≤ a few hundred MB): zero
  *    shuffle of the stream, no state, and a dimension refresh is just
  *    replanning the batch side.
  *  - `broadcast = false`: shuffled join for jumbo dimensions. The
  *    stream side shuffles EVERY micro-batch — prefer pre-bucketing the
  *    dimension on the key before reaching for this.
  *
  * Left join keeps unmatched events (late dimension rows arrive on a
  * later refresh); inner drops them.
  */
object StreamEnrich {

  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      joinType: String = "left",
      useBroadcast: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "enrichment needs at least one join key")
    val side = if (useBroadcast) broadcast(dim) else dim
    stream.join(side, keys, joinType)
  }

  /** Enrichment with a derived join key (e.g. a bucketed timestamp or
    * an extracted domain): `keyExpr` is computed on the stream side and
    * matched against `dimKey` on the dimension.
    */
  def enrichByExpr(
      stream: DataFrame,
      dim: DataFrame,
      keyExpr: Column,
      dimKey: String,
      joinType: String = "left",
      useBroadcast: Boolean = true): DataFrame = {
    val side = if (useBroadcast) broadcast(dim) else dim
    stream.join(side, keyExpr === col(dimKey), joinType)
  }
}
