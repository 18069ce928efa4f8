package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable range joins via fixed-width binning.
  *
  * Spark plans a join whose ONLY predicate is a range condition as
  * BroadcastNestedLoopJoin (small side) or a cartesian product — both
  * O(|L|x|R|) and fatal at scale. The standard fix (the same shape as
  * Databricks' range-join optimization and Flink's interval join) is to
  * quantize the number line into fixed-width bins so the range
  * predicate gains an equi-join component: explode each interval to
  * every bin it covers, equi-join on the bin id (hash shuffle, never a
  * cross product), then re-check the exact predicate.
  *
  * Cost model: explode factor is `interval_len / binWidth + 1` per
  * interval, so `binWidth` should sit near the TYPICAL interval length
  * — too small multiplies the shuffled right side, too large degrades
  * each bin toward a mini cross join. Both operators shuffle
  * `O(|L| + |R| x explode)` rows and compare only within-bin pairs.
  *
  * Dedup discipline: a pair can share several bins, so emitting from
  * every shared bin would duplicate it. [[pointInInterval]] needs no
  * dedup (a point lives in exactly one bin); [[intervalOverlap]]
  * assigns each pair a single RESPONSIBLE bin — the bin of
  * `greatest(lo_a, lo_b)`, which both sides of a true overlap always
  * cover — instead of a post-hoc `distinct()` (a second full shuffle
  * of the output).
  */
object RangeJoin {

  private def binOf(v: Column, binWidth: Double): Column =
    floor(v / lit(binWidth)).cast("long")

  /** All bins `[floor(lo/w) .. floor(hi/w)]` covered by an interval. */
  private def binsOf(lo: Column, hi: Column, binWidth: Double): Column =
    sequence(binOf(lo, binWidth), binOf(hi, binWidth))

  /** Join left rows carrying a point `pointCol` to right rows carrying
    * an interval `[loCol, hiCol)` (half-open; set `closedHi` for
    * `<= hi`). Output: all left columns plus all right columns.
    *
    * The left side maps to ONE bin per row (no explode, no dedup); the
    * right side explodes to its covered bins. Optional `keys` adds
    * equality columns (present on both sides) to the join — the bin id
    * simply rides along in the shuffle key.
    */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      keys: Seq[String] = Nil,
      closedHi: Boolean = false): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binCol = "__graft_range_bin"
    val l = left.withColumn(binCol, binOf(col(pointCol), binWidth))
    val r = right.withColumn(binCol, explode(binsOf(col(loCol), col(hiCol), binWidth)))
    val hiPred = if (closedHi) col(pointCol) <= col(hiCol) else col(pointCol) < col(hiCol)
    l.join(r, Seq(binCol) ++ keys)
      .filter(col(pointCol) >= col(loCol) && hiPred)
      .drop(binCol)
  }

  /** Join rows of `left` carrying `[aLo, aHi]` to rows of `right`
    * carrying `[bLo, bHi]` where the closed intervals overlap
    * (`aLo <= bHi && bLo <= aHi`). Both sides explode to covered bins;
    * each true overlap is emitted exactly once, from the bin containing
    * `greatest(aLo, bLo)` (always covered by both intervals).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      aLo: String,
      aHi: String,
      bLo: String,
      bHi: String,
      binWidth: Double,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binCol = "__graft_range_bin"
    val l = left.withColumn(binCol, explode(binsOf(col(aLo), col(aHi), binWidth)))
    val r = right.withColumn(binCol, explode(binsOf(col(bLo), col(bHi), binWidth)))
    l.join(r, Seq(binCol) ++ keys)
      .filter(
        col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
          col(binCol) === binOf(greatest(col(aLo), col(bLo)), binWidth))
      .drop(binCol)
  }
}
