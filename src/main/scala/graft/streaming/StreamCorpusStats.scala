package graft.streaming

import graft.functions.TextFunctions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming per-language corpus report — the in-flight form of the
  * batch `corpus_stats` table an ingest round publishes: event-time
  * windows of doc/token/char statistics per language, emitted append-
  * mode once the watermark closes each window.
  *
  * State scale: with watermark + append mode, state is O(active
  * windows x languages). The percentile columns choose the state
  * shape: the default `approx_percentile` keeps a bounded sketch per
  * (window, lang) — the 100 TB stream path; `exactPercentiles = true`
  * buffers each window's token counts exactly (one long per doc), the
  * form that matches the batch report bit-for-bit and is fine at
  * review/benchmark scale (StreamCorpusStatsSpec proves single-window
  * stream == batch formula on the same rows).
  */
object StreamCorpusStats {

  /** Windowed per-language report over a document stream.
    *
    * @param docs streaming DataFrame carrying (tsCol, langCol, textCol)
    * @param windowDuration tumbling window, e.g. "1 minute"
    * @param watermark max lateness, e.g. "2 minutes"
    * @param exactPercentiles exact `percentile` (unbounded per-window
    *        buffer, batch-identical) vs `approx_percentile` (bounded
    *        sketch; default)
    * @return (window_start, window_end, lang, n_docs, total_tokens,
    *         med_tokens, p95_tokens, avg_chars)
    */
  def windowedReport(
      docs: DataFrame,
      tsCol: String,
      langCol: String,
      textCol: String,
      windowDuration: String,
      watermark: String,
      exactPercentiles: Boolean = false): DataFrame = {
    def pct(q: Double) =
      if (exactPercentiles) percentile(col("toks"), lit(q))
      else approx_percentile(col("toks"), lit(q), lit(10000)).cast("double")
    docs
      .withWatermark(tsCol, watermark)
      .select(
        col(tsCol),
        col(langCol).as("lang"),
        TextFunctions.tokenCount(col(textCol)).as("toks"),
        length(col(textCol)).cast("long").as("n_chars"))
      .groupBy(window(col(tsCol), windowDuration), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        round(pct(0.5), 4).as("med_tokens"),
        round(pct(0.95), 4).as("p95_tokens"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("lang"), col("n_docs"), col("total_tokens"),
        col("med_tokens"), col("p95_tokens"), col("avg_chars"))
  }
}
