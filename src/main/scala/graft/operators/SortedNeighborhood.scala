package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood dedup (Hernández & Stolfo 1995) — the
  * SORT-based blocking alternative to the hash/LSH family: records
  * sort by a discriminating key (here the document's leading tokens),
  * and only records within a sliding window of `windowSize` positions
  * compare. One range-partitioned sort + a linear lag pass replaces
  * the all-pairs join; near-duplicates that share a prefix land
  * adjacent and are found with EXACT token-Jaccard — no probabilistic
  * recall band at all, unlike MinHash — at the price of missing dups
  * whose keys diverge (the standard fix is multi-pass with rotated
  * keys; each pass is this operator with a different `keyTokens`).
  *
  * Scale shape: the window runs PARTITIONED by a coarse key bucket
  * (the first token by default) — never a global single-partition
  * window — so the sort is a range shuffle and the comparisons are
  * `windowSize * n` with per-bucket parallelism. Similarity gates on
  * the exact integer cross-multiplication `den*inter >= num*uni`
  * (no float ratio), which is also what lets an ANSI oracle replay
  * every candidate decision bit-exactly.
  */
object SortedNeighborhood {

  /** Near-duplicate pairs among window neighbors.
    *
    * @param windowSize compare each record to its `windowSize - 1`
    *                   sort predecessors
    * @param keyTokens  leading-token count forming the sort key
    * @param minSimNum/minSimDen Jaccard threshold as an exact
    *                   rational (default 4/5 = 0.8)
    * @return (id_a, id_b, inter, uni), id_a < id_b, distinct
    */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowSize: Int = 3,
      keyTokens: Int = 6,
      minSimNum: Int = 4,
      minSimDen: Int = 5): DataFrame = {
    require(windowSize >= 2, "windowSize must be >= 2")
    val ws = TextFunctions.tokens(col(textCol))
    val keyed = docs.select(
      col(idCol).as("__id"),
      array_distinct(ws).as("__toks"),
      element_at(ws, 1).as("__bucket"),
      concat_ws(" ", slice(ws, 1, keyTokens)).as("__key"))
    val w = Window.partitionBy(col("__bucket")).orderBy(col("__key"), col("__id"))
    val lagCols = (1 until windowSize).flatMap(i => Seq(
      lag(col("__id"), i).over(w).as(s"__lid$i"),
      lag(col("__toks"), i).over(w).as(s"__ltk$i")))
    val lagged = keyed.select(col("__id") +: col("__toks") +: lagCols: _*)
    val candidates = (1 until windowSize).map { i =>
      lagged
        .filter(col(s"__lid$i").isNotNull)
        .select(
          least(col("__id"), col(s"__lid$i")).as("id_a"),
          greatest(col("__id"), col(s"__lid$i")).as("id_b"),
          size(array_intersect(col("__toks"), col(s"__ltk$i"))).as("inter"),
          size(array_union(col("__toks"), col(s"__ltk$i"))).as("uni"))
    }.reduce(_.unionByName(_))
    candidates
      .filter(col("inter") * minSimDen >= col("uni") * minSimNum)
      .select(col("id_a"), col("id_b"),
        col("inter").cast("long").as("inter"), col("uni").cast("long").as("uni"))
      .distinct()
  }

  /** CHARACTER-level near-duplicate pairs among window neighbors —
    * the record-linkage verify (typos, small insertions) that token
    * Jaccard is blind to. Same sort-based blocking as
    * [[nearDupPairs]]; the verify is exact Levenshtein distance,
    * guarded twice for scale: a length-difference pre-filter (edit
    * distance is at least |len(a) − len(b)|, so those pairs skip the
    * O(n·m) DP entirely) and Spark's THRESHOLDED
    * `levenshtein(a, b, maxDist)`, whose band-limited DP early-exits
    * at O(n·maxDist) instead of O(n·m) — the difference between
    * feasible and not on kilobyte documents.
    *
    * @return (id_a, id_b, dist), id_a < id_b, distinct, dist <= maxDist
    */
  def nearDupPairsByEdit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowSize: Int = 3,
      keyTokens: Int = 6,
      maxDist: Int = 24): DataFrame = {
    require(windowSize >= 2, "windowSize must be >= 2")
    require(maxDist >= 0, "maxDist must be non-negative")
    val ws = TextFunctions.tokens(col(textCol))
    val keyed = docs.select(
      col(idCol).as("__id"),
      lower(trim(col(textCol))).as("__txt"),
      element_at(ws, 1).as("__bucket"),
      concat_ws(" ", slice(ws, 1, keyTokens)).as("__key"))
    val w = Window.partitionBy(col("__bucket")).orderBy(col("__key"), col("__id"))
    val lagCols = (1 until windowSize).flatMap(i => Seq(
      lag(col("__id"), i).over(w).as(s"__lid$i"),
      lag(col("__txt"), i).over(w).as(s"__ltx$i")))
    val lagged = keyed.select(col("__id") +: col("__txt") +: lagCols: _*)
    val candidates = (1 until windowSize).map { i =>
      lagged
        .filter(col(s"__lid$i").isNotNull &&
          abs(length(col("__txt")) - length(col(s"__ltx$i"))) <= maxDist)
        .select(
          least(col("__id"), col(s"__lid$i")).as("id_a"),
          greatest(col("__id"), col(s"__lid$i")).as("id_b"),
          levenshtein(col("__txt"), col(s"__ltx$i"), maxDist).as("dist"))
    }.reduce(_.unionByName(_))
    candidates
      .filter(col("dist") >= 0) // thresholded form returns -1 above maxDist
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .distinct()
  }
}
