package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: assign inactivity-gap session ids with two
  * window passes over (key, ts) — lag to flag session starts, then a
  * running sum to number them. One shuffle on the key; both windows
  * share the same sort. (The streaming counterpart with bounded state
  * is [[graft.streaming.Sessionize]].)
  */
object Sessionization {

  /** Adds a `session_id` column (0-based per key, in time order). */
  def assignSessions(
      df: DataFrame,
      keyCols: Seq[String],
      tsSeconds: Column,
      gapSeconds: Long): DataFrame = {
    val byTime = Window.partitionBy(keyCols.map(col): _*).orderBy(tsSeconds.asc)
    val newSession = when(
      tsSeconds - lag(tsSeconds, 1).over(byTime) > gapSeconds, 1L
    ).otherwise(0L) // first row per key: lag is null -> comparison null -> 0
    df.withColumn(
      "session_id",
      sum(newSession).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregates: event count, duration, bounds. */
  def sessionStats(
      df: DataFrame,
      keyCols: Seq[String],
      tsSeconds: Column,
      gapSeconds: Long): DataFrame =
    assignSessions(df, keyCols, tsSeconds, gapSeconds)
      .withColumn("__ts_s", tsSeconds)
      .groupBy((keyCols.map(col) :+ col("session_id")): _*)
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("__ts_s")) - min(col("__ts_s"))).as("duration_s"),
        min(col("__ts_s")).as("start_s"))
}
