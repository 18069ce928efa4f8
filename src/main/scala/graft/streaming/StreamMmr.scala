package graft.streaming

import graft.functions.VectorFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming MMR diversity gate — the serving-time half of
  * [[graft.operators.SimilaritySearch.mmrSelect]]: greedy MMR's
  * selection LOOP is inherently sequential (each pick changes the next
  * round's penalties — not streamable), but once a selection batch is
  * fixed, scoring NEW candidates against it is a pure per-row
  * projection: relevance to the query minus the running max-similarity
  * to the FIXED selected set, both on the exact µ-grid integers
  * `floor(1e6·cos)` that make every verdict engine-replayable.
  *
  * That is exactly the production serving shape: an offline MMR pass
  * picks the day's exemplars; the online stream then gates arrivals —
  * "relevant, and not a near-copy of anything already selected" — at
  * one fused cosine fold per selected vector per row. The selected set
  * rides the plan as ONE literal (k vectors — a selection batch, never
  * corpus-sized), so the operator carries ZERO streaming state: no
  * watermark, no state store, `append`-mode legal on any source.
  * StreamMmrSpec pins the stream == batch differential and the score
  * agreement with `mmrSelect`'s own next-round arithmetic.
  */
object StreamMmr {

  private def simMicro(a: Column, b: Column): Column =
    floor(VectorFunctions.cosineDecimal(a, b) * lit(1e6)).cast("long")

  /** Score candidates against a fixed selected set: adds `rel_micro`
    * (µ-cosine to `query`), `max_sim_micro` (max µ-cosine to
    * `selected`; 0 when empty — no penalty, matching `mmrSelect`'s
    * first round), `score_micro` (`num·rel − (den−num)·maxSim`), and
    * `keep` (`score_micro >= minScoreMicro`).
    */
  def diversityGate(
      df: DataFrame,
      vecCol: String,
      query: Seq[Float],
      selected: Seq[Seq[Float]],
      lambdaNum: Long = 1L,
      lambdaDen: Long = 2L,
      minScoreMicro: Long = 0L): DataFrame = {
    require(lambdaNum > 0 && lambdaDen >= lambdaNum,
      "lambda must be a rational in (0, 1]")
    val v = col(vecCol)
    val sims = selected.map(s => simMicro(v, typedLit(s)))
    val maxSim = sims match {
      case Seq() => lit(0L)
      case Seq(one) => one
      case many => greatest(many: _*)
    }
    df.withColumn("rel_micro", simMicro(v, typedLit(query)))
      .withColumn("max_sim_micro", maxSim)
      .withColumn("score_micro",
        col("rel_micro") * lit(lambdaNum) -
          col("max_sim_micro") * lit(lambdaDen - lambdaNum))
      .withColumn("keep", col("score_micro") >= lit(minScoreMicro))
  }
}
