package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both operators use hash-ordering rather than RNG state: the sample
  * is a pure function of the data, so re-runs, retries, and oracle
  * checks agree — the property a reproducible data pipeline needs.
  */
object Sampling {

  /** Deterministic stratified sample: the `k` rows with the smallest
    * `xxhash64(idCols)` per group. Physically a rank-limit window —
    * Spark 4 pushes a partial top-k before the shuffle
    * (WindowGroupLimit), so each map task ships at most `k` rows per
    * group.
    */
  def samplePerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      idCols: Seq[String],
      k: Int,
      hash: Option[Column] = None): DataFrame = {
    val h = hash.getOrElse(xxhash64(idCols.map(col): _*))
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(h.asc +: idCols.map(c => col(c).asc): _*)
    df.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= k)
      .drop("__graft_rk")
  }

  /** Deterministic Bernoulli sample: keep a row iff
    * `pmod(xxhash64(idCols), denom) < num` — an exact `num/denom`
    * hash-rate, stable across runs and engines that share the hash.
    * For oracle parity with engines lacking xxhash64, use
    * [[hashRateFilter]] with a custom hash column (e.g. md5-based).
    */
  def hashRate(df: DataFrame, idCols: Seq[String], num: Int, denom: Int): DataFrame =
    df.filter(pmod(xxhash64(idCols.map(col): _*), lit(denom.toLong)) < num.toLong)

  /** Rate-filter on a caller-supplied deterministic hash column. */
  def hashRateFilter(df: DataFrame, hash: Column, num: Int, denom: Int): DataFrame =
    df.filter(pmod(hash, lit(denom.toLong)) < num.toLong)
}
