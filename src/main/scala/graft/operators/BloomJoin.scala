package graft.operators

import graft.functions.BloomFilter

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filtered joins — the runtime-row-filter pattern made explicit:
  * build a bloom over the SMALL side's join keys (one aggregation →
  * kilobytes-to-megabytes of filter, independent of the big side),
  * broadcast it, and pre-filter the BIG side with the codegen'd
  * membership probe BEFORE its join shuffle. The real join still runs,
  * so bloom false positives are eliminated and the result is
  * IDENTICAL to the unfiltered join (false negatives are impossible) —
  * the bloom's only effect is cutting the big side's shuffle volume to
  * (selectivity + fp-rate) of the input.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~1% of it a selective dimension predicate
  * actually keeps; Spark's AQE injects the same idea as
  * InSubquery/bloom runtime filters when statistics cooperate — this
  * operator is the deterministic, always-on form for the pipelines
  * that know their dimension side is selective. ([[BloomFilter]]'s
  * geometry notes: 2^22 bits holds ~400 k keys under 1% fp.)
  */
object BloomJoin {

  private def keyStr(c: org.apache.spark.sql.Column) = c.cast("string")

  /** Big-side rows whose `bigKey` appears in `small`'s `smallKey` —
    * exactly `big LEFT SEMI JOIN small`, with the bloom pre-filter
    * ahead of the shuffle.
    */
  def semiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      numBits: Int = BloomFilter.DefaultNumBits,
      numHashes: Int = BloomFilter.DefaultNumHashes): DataFrame =
    prefiltered(big, bigKey, small, smallKey, numBits, numHashes)
      .join(small.select(col(smallKey).as("__bj_key")).distinct(),
        col(bigKey) === col("__bj_key"), "left_semi")

  /** The plain inner join, bloom-pre-filtered the same way. When the
    * two key columns share a name the joined frame keeps only the big
    * side's copy (the values are equal by the join predicate).
    */
  def innerJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      numBits: Int = BloomFilter.DefaultNumBits,
      numHashes: Int = BloomFilter.DefaultNumHashes): DataFrame = {
    val pre = prefiltered(big, bigKey, small, smallKey, numBits, numHashes)
    if (bigKey == smallKey)
      pre.join(small.withColumnRenamed(smallKey, "__bj_key"),
        col(bigKey) === col("__bj_key")).drop("__bj_key")
    else
      pre.join(small, col(bigKey) === col(smallKey))
  }

  /** The big side with the bloom probe applied (exposed for plans that
    * join manually or want the reduced frame for something else).
    */
  def prefiltered(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      numBits: Int = BloomFilter.DefaultNumBits,
      numHashes: Int = BloomFilter.DefaultNumHashes): DataFrame = {
    val bloom = small.agg(
      BloomFilter.sketch(keyStr(col(smallKey)), numBits, numHashes).as("__bloom"))
    big
      .crossJoin(broadcast(bloom))
      .filter(BloomFilter.contains(col("__bloom"), keyStr(col(bigKey)), numBits, numHashes))
      .drop("__bloom")
  }
}
