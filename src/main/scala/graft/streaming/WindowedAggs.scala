package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed streaming aggregations (beyond the reference's
  * surface, which handles lateness transactionally and needs no
  * watermarks — SURVEY §2.8 T6; these are the standard streaming
  * analytics the engine offers as first-class ops).
  *
  * State scale note: with watermark + append mode, Spark bounds state
  * to windows newer than (max event time - watermark); state size is
  * O(active windows x groups), independent of stream length.
  */
object WindowedAggs {

  /** Tumbling-window counts/sums per group with a watermark.
    *
    * @param df streaming DataFrame with an event-time column
    * @param tsCol event-time column (TimestampType)
    * @param groupCols grouping columns beside the window
    * @param windowDuration e.g. "5 minutes"
    * @param watermark max lateness, e.g. "10 minutes"
    * @param valueCol numeric column to sum (in addition to count)
    */
  def tumblingCounts(
      df: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      windowDuration: String,
      watermark: String,
      valueCol: Option[String] = None): DataFrame = {
    val grouped = df
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration) +: groupCols.map(col): _*)
    val base = valueCol match {
      case Some(v) => grouped.agg(count(lit(1)).as("n"), sum(col(v)).as("total"))
      case None => grouped.agg(count(lit(1)).as("n"))
    }
    val outCols = Seq(col("window.start").as("window_start"), col("window.end").as("window_end")) ++
      groupCols.map(col) ++
      base.columns.filterNot(c => c == "window" || groupCols.contains(c)).map(col)
    base.select(outCols: _*)
  }

  /** Sliding-window variant. */
  def slidingCounts(
      df: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      windowDuration: String,
      slideDuration: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration, slideDuration) +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(Seq(col("window.start").as("window_start"), col("window.end").as("window_end")) ++
        groupCols.map(col) :+ col("n"): _*)
}
