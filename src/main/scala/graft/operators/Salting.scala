package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the skewed (large) side into
  * `saltFactor` sub-keys and replicate the other side across all salt
  * values. Turns one hot-key reducer into `saltFactor` parallel ones at
  * the cost of replicating the right side `saltFactor`x — appropriate
  * when the right side is modest but above the broadcast threshold.
  *
  * (AQE's skew-join handles sort-merge skew automatically when
  * statistics see it; explicit salting remains the tool for aggregations
  * keyed on hot values and for joins AQE cannot split.)
  */
object Salting {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join `left` (skewed) with `right` on `keys`, salted. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // salt from the key columns plus monotonically_increasing_id — NOT
    // stable across runs (the id depends on partition layout), which is
    // fine: the salt only has to spread rows, never to be reproducible
    val salted = left.withColumn(
      SaltCol, pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*), lit(saltFactor)))
    val replicated = right.withColumn(
      SaltCol, explode(sequence(lit(0L), lit((saltFactor - 1).toLong))))
    salted.join(replicated, keys :+ SaltCol, "inner").drop(SaltCol)
  }

  /** Two-phase skew-robust aggregation: aggregate on (keys, salt) first
    * (splitting hot keys across reducers), then combine per key.
    * `partials` aggregates must be decomposable (sum/count/min/max —
    * pass the same expression for both phases for sum-like metrics).
    */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      valueCol: Column,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    df.withColumn(SaltCol, pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
      .groupBy((keys.map(col) :+ col(SaltCol)): _*)
      .agg(sum(valueCol).as("__graft_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__graft_partial")).as("total"))
  }
}
