package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Snapshot diff between two corpus versions — the audit step of an
  * incremental pipeline ("what did this ingest round actually do?"):
  * classify every document id as added, removed, changed, or unchanged
  * by comparing canonical content fingerprints.
  *
  * One full-outer shuffle join on id over two (id, fp) projections —
  * the minimal movement for an id-aligned compare. At 100 TB both
  * snapshots bucketed by id turn this into a zero-shuffle sort-merge;
  * the fingerprint projection keeps the shuffled payload at ~48 bytes
  * per row no matter how wide the documents are.
  */
object CorpusDiff {

  /** @return (id, status) for every id in either snapshot, status in
    *         {added, removed, changed, unchanged}
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val o = oldSnap.select(
      col(idCol).as("id"), TextFunctions.fingerprint(col(textCol)).as("fp_old"))
    val n = newSnap.select(
      col(idCol).as("id"), TextFunctions.fingerprint(col(textCol)).as("fp_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(
        col("id"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Diff counts by status — the one-line ingest-round summary. */
  def summary(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
