package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-change-per-key deduplication — the semantic heart of the CDC
  * engine (reference: src/kafka2delta/stream/stream.py:91-96).
  *
  * A micro-batch can carry many changes for the same key; only the newest
  * (highest log-sequence-number) may reach the merge. `dropDuplicates` is
  * NOT equivalent — the ordering by version is load-bearing.
  *
  * Scale notes: one shuffle on the key columns; `row_number` needs no
  * buffering beyond the sort run, and Catalyst pushes the `rn = 1`
  * predicate into a rank-limit (top-1 per key) physical window, so this
  * holds at arbitrary batch sizes.
  */
object CdcDedup {

  private val RnCol = "__graft_rn"

  /** Keep, per key, the single row that sorts first by `orderBy`
    * (typically `desc(versionCol)`).
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(RnCol, row_number().over(w))
      .filter(col(RnCol) === 1)
      .drop(RnCol)
  }

  /** Reference form: newest version per key by a single monotone version
    * column (stream.py:92 `ORDER BY lsn DESC`).
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame =
    latestPerKey(df, keyCols, Seq(col(versionCol).desc))

  /** Aggregation form of latest-per-key: `max_by(struct(*), orderBy)`.
    *
    * Semantically equal to the window form when `orderBy` is unique per
    * key (CDC LSNs are; equal-version rows are replay duplicates with
    * identical payloads, where any pick is correct).
    *
    * Physical form (verified with `Plans`): partial/final SortAggregate
    * (the struct-typed buffer precludes hash aggregation), so the
    * shuffle still carries at most one row per key per map partition.
    * Spark 4's rank-limit pushdown (`WindowGroupLimit`) gives the
    * window form a pre-shuffle partial top-1 as well — both forms are
    * skew-bounded. The aggregation form's edge: as an Aggregate it can
    * reuse an existing hash-partitioning on the keys (observed in the
    * merge path: dedup + merge share ONE exchange), while a window
    * always needs its own sort.
    */
  def latestPerKeyAgg(df: DataFrame, keyCols: Seq[String], orderBy: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, orderBy).as("__graft_row"))
      .select(col("__graft_row.*"))
  }

  /** [[latestPerKeyAgg]] ordered by a single version column. */
  def latestPerKeyAgg(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame =
    latestPerKeyAgg(df, keyCols, col(versionCol))
}
