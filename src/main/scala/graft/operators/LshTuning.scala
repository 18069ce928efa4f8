package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MinHash-LSH banding calibration — the planning step BEFORE a
  * corpus-scale near-dup run: given a signature budget (total hashes
  * H) and a target Jaccard threshold t, choose the (bands b, rows r)
  * split, b·r = H, whose S-curve
  *
  *   P(candidate | J = j) = 1 − (1 − j^r)^b
  *
  * puts its midpoint at the threshold (|P(t) − 1/2| minimal; ties go
  * to fewer bands — fewer bands mean fewer bucket-join repetitions,
  * the dominant cost at scale). This is how the banded dedup family's
  * `bands`/`rowsPerBand` knobs ([[TextDedup]]) should be chosen
  * instead of guessed: a misplaced midpoint either floods the
  * pair-budget guards with sub-threshold candidates or silently drops
  * recall.
  *
  * Numerics contract: every power is evaluated as a LEFT-FOLD
  * multiplication chain (`aggregate(sequence(...))` — whole-stage
  * codegen, no `pow`), so the result is a deterministic sequence of
  * IEEE multiplies that any engine replays bit-for-bit; `Math.pow`'s
  * 1-ulp license would break oracle hashing. The config space is
  * metadata-sized (divisor pairs × thresholds), so this is pure plan
  * algebra — no data is touched.
  */
object LshTuning {

  /** One row per (total_hashes, threshold): the chosen split plus the
    * S-curve read at the threshold and at ±probe offsets (the spread
    * `p_high − p_low` is the selectivity the banding actually buys).
    *
    * @param budgets    candidate signature sizes (e.g. 64, 128, 256)
    * @param thresholds target Jaccard thresholds in (probeBelow, 1 − probeAbove)
    * @param probeBelow how far below t to read the curve (default 0.2)
    * @param probeAbove how far above t to read the curve (default 0.05)
    */
  def tune(
      spark: SparkSession,
      budgets: Seq[Int],
      thresholds: Seq[Double],
      probeBelow: Double = 0.2,
      probeAbove: Double = 0.05): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= 2), "budgets must be >= 2")
    require(thresholds.nonEmpty &&
      thresholds.forall(t => t - probeBelow > 0 && t + probeAbove < 1),
      "thresholds must leave room for the probe offsets in (0, 1)")
    import spark.implicits._

    // P(candidate | J = j) as the exact multiply chain:
    // q = fold(1.0, r times, *j); p = 1 - fold(1.0, b times, *(1-q))
    def pCatch(j: org.apache.spark.sql.Column) = {
      val jr = aggregate(sequence(lit(1), col("rows_per_band")),
        lit(1.0), (acc, _) => acc * j)
      lit(1.0) - aggregate(sequence(lit(1), col("bands")),
        lit(1.0), (acc, _) => acc * (lit(1.0) - jr))
    }

    // the config space is a constant-size grid (divisor pairs x
    // thresholds) — enumerate it as metadata, not as a join
    val configs = (for {
      h <- budgets
      r <- 1 to h if h % r == 0
      t <- thresholds
    } yield (h, r, h / r, t)).toDF("total_hashes", "rows_per_band", "bands", "threshold")
    val scored = configs
      .withColumn("p_at_t", pCatch(col("threshold")))
      .withColumn("p_low", pCatch(col("threshold") - lit(probeBelow)))
      .withColumn("p_high", pCatch(col("threshold") + lit(probeAbove)))
    val best = Window.partitionBy(col("total_hashes"), col("threshold"))
      .orderBy(abs(col("p_at_t") - lit(0.5)).asc, col("bands").asc)
    scored
      .withColumn("__rank", row_number().over(best))
      .filter(col("__rank") === 1)
      .drop("__rank")
      .select(col("total_hashes"), col("threshold"), col("bands"),
        col("rows_per_band"), col("p_at_t"), col("p_low"), col("p_high"))
  }

  /** Driver-side scalar twin of [[tune]] for ONE (budget, threshold):
    * the `(bands, rowsPerBand)` whose S-curve midpoint sits closest to
    * the threshold, ties to fewer bands. Replays the exact same
    * left-fold multiply chains as the DataFrame path (and the oracle's
    * recursive CTEs), so the three agree bit-for-bit — this is the
    * entry point the banded dedup family's DEFAULT knobs derive from
    * ([[Curation.BandedMinhash]], [[TextDedup.minhashCandidatePairs]])
    * instead of hand-set constants: config-space-sized work, so it
    * runs at session setup, not per-row.
    */
  def pick(totalHashes: Int, threshold: Double): (Int, Int) = {
    require(totalHashes >= 2, "totalHashes must be >= 2")
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    val candidates = for {
      r <- 1 to totalHashes if totalHashes % r == 0
      b = totalHashes / r
    } yield {
      val p = 1.0 - foldPow(1.0 - foldPow(threshold, r), b)
      (b, r, math.abs(p - 0.5))
    }
    val (b, r, _) = candidates.minBy { case (b, _, d) => (d, b) }
    (b, r)
  }

  private def foldPow(base: Double, n: Int): Double =
    (1 to n).foldLeft(1.0)((acc, _) => acc * base)

  /** CORPUS-SIZE-AWARE operating point (the r17 sf16 finding: a FIXED
    * (bands, rows) split has constant per-pair collision probability,
    * so false-positive candidate pairs grow ~n² even when every bucket
    * respects its own pair budget — `dedup_clusters` measured 1107 s /
    * 19,885 cpu-s at 800k docs and OOM'd the 8 GiB JVM on the 8×4
    * split that is perfect at gate scale).
    *
    * Model: sub-threshold background pairs sit at Jaccard ≈
    * `background` (default `threshold − 0.2`, the same probe offset
    * [[tune]] reads the S-curve at), so a split (b, r) admits
    * ≈ n²/2 · (1 − (1 − bg^r)^b) false-positive candidates. A split is
    * FEASIBLE when that stays within a LINEAR budget (`fpPerDoc · n` —
    * candidate volume an exact-verify stage can absorb per document;
    * the default 512 is sized so the pinned (32, 0.5) point keeps
    * [[pick]]'s 8×4 split through n ≈ 16k — 3× above the LARGEST gate
    * corpus, sf0.1's 5,100 planted docs — and first deepens at the
    * 50k sf1 rehearsal rung: an r18 session shipped fpPerDoc = 32
    * believing sf0.1 held 510 docs and silently flipped the sf0.1
    * operating point to (4, 8), losing 13 borderline-recall pairs vs
    * the oracle's pinned-form replay). INVARIANT (r18 ADVICE): 512 is
    * also a verify-cost bound in its own right — ~512 candidate pairs
    * per document is ~one extra shingle-array comparison per 2 KB of
    * corpus text, well inside what the staged-shingle exact-verify
    * join absorbs linearly — so if the gate fixtures ever grow past
    * 16k docs, re-derive the budget from BOTH constraints
    * (LshTuningSpec pins the resulting gate-SF operating points)
    * rather than re-tuning to the new corpus margin alone;
    * among feasible splits the choice is [[pick]]'s midpoint objective
    * (ties to fewer bands), so wherever the corpus is small enough
    * that [[pick]]'s own answer is feasible — every oracle SF with
    * margin — this returns EXACTLY [[pick]]'s split and
    * gated results are byte-identical. As n grows the feasibility
    * constraint forces rows-per-band up ~log n (bg^r must fall ~1/n),
    * which is the published LSH answer to corpus growth: re-tune the
    * operating point, don't ship one split to a trillion documents.
    * When no split is feasible (n beyond the signature budget's
    * reach), the deepest split (minimal background collision
    * probability) is returned — the pair-count guard downstream is
    * then the backstop.
    */
  def pickSized(
      totalHashes: Int,
      threshold: Double,
      nDocs: Long,
      fpPerDoc: Double = 512.0,
      background: Double = Double.NaN): (Int, Int) = {
    require(totalHashes >= 2, "totalHashes must be >= 2")
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    require(nDocs >= 0, "nDocs must be non-negative")
    val bg = if (background.isNaN) math.max(threshold - 0.2, 0.01) else background
    require(bg > 0 && bg < 1, "background must be in (0, 1)")
    val n = nDocs.toDouble
    val budget = fpPerDoc * n
    val candidates = for {
      r <- 1 to totalHashes if totalHashes % r == 0
      b = totalHashes / r
    } yield {
      val pMid = 1.0 - foldPow(1.0 - foldPow(threshold, r), b)
      val pBg = 1.0 - foldPow(1.0 - foldPow(bg, r), b)
      (b, r, math.abs(pMid - 0.5), pBg)
    }
    val feasible = candidates.filter { case (_, _, _, pBg) => n * n / 2.0 * pBg <= budget }
    if (feasible.nonEmpty) {
      val (b, r, _, _) = feasible.minBy { case (b, _, d, _) => (d, b) }
      (b, r)
    } else {
      val (b, r, _, _) = candidates.minBy { case (b, _, _, pBg) => (pBg, b) }
      (b, r)
    }
  }
}
