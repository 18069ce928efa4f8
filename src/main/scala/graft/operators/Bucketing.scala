package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins.
  *
  * Two tables bucketed by the same columns into the same bucket count
  * join WITHOUT a shuffle on either side (the scan itself reports
  * hash-partitioning). At 100 TB this converts every recurring
  * fact-to-fact join on the bucket key from a full two-sided shuffle
  * into a local zip of bucket files — the single biggest recurring-cost
  * saving a warehouse layout decision can make. The price is paid once
  * at write time, which is why it belongs in the table layout, not the
  * query.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted, catalog-registered table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the co-location check for bucket joins.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Join two same-bucketed tables on the bucket columns. */
  def bucketJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      on: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)
}
