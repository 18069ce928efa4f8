package graft

import graft.operators.LshTuning

import org.scalatest.funsuite.AnyFunSuite

/** The banding calibrator must pick the divisor split whose S-curve
  * midpoint sits at the target threshold, and its multiply-chain
  * powers must equal the straight fold (the oracle-replayable form).
  */
class LshTuningSpec extends SparkSpec {

  private def foldPow(x: Double, n: Int): Double =
    (1 to n).foldLeft(1.0)((acc, _) => acc * x)

  private def pRef(j: Double, b: Int, r: Int): Double =
    1.0 - foldPow(1.0 - foldPow(j, r), b)

  private lazy val tuned = LshTuning.tune(spark,
    budgets = Seq(64, 128, 256), thresholds = Seq(0.5, 0.7, 0.8, 0.9))
    .collect()
    .map(w => (w.getInt(0), w.getDouble(1)) ->
      (w.getInt(2), w.getInt(3), w.getDouble(4), w.getDouble(5), w.getDouble(6)))
    .toMap

  test("one row per (budget, threshold); bands * rows == budget") {
    assert(tuned.size == 12)
    tuned.foreach { case ((h, _), (b, r, _, _, _)) => assert(b * r == h) }
  }

  test("the emitted curve reads are bit-identical to the fold reference") {
    tuned.foreach { case ((_, t), (b, r, pAtT, pLow, pHigh)) =>
      assert(pAtT == pRef(t, b, r))
      assert(pLow == pRef(t - 0.2, b, r))
      assert(pHigh == pRef(t + 0.05, b, r))
    }
  }

  test("the chosen split is the argmin of |P(t) - 1/2| over all divisor pairs") {
    tuned.foreach { case ((h, t), (b, _, pAtT, _, _)) =>
      val all = (1 to h).filter(h % _ == 0).map { r =>
        (h / r, r, math.abs(pRef(t, h / r, r) - 0.5))
      }
      val bestScore = all.map(_._3).min
      assert(math.abs(pAtT - 0.5) == bestScore)
      // ties go to fewer bands
      val winners = all.filter(_._3 == bestScore).map(_._1)
      assert(b == winners.min)
    }
  }

  test("the S-curve is monotone around the threshold and steep across it") {
    tuned.foreach { case ((_, _), (_, _, pAtT, pLow, pHigh)) =>
      assert(pLow < pAtT && pAtT < pHigh)
      // large budgets at low thresholds have a coarse divisor grid
      // (H=256, t=0.5 can only reach spread ~0.23) — the floor is the
      // still-useful worst case, not the typical ~0.7
      assert(pHigh - pLow > 0.2, "banding bought no selectivity")
    }
  }

  test("known splits: H=128 at t=0.7 lands on the classic 16 bands x 8 rows") {
    // (1/16)^(1/8) = 0.707... — the textbook S-curve midpoint
    val (b, r, _, _, _) = tuned((128, 0.7))
    assert((b, r) == (16, 8))
  }

  test("the scalar pick agrees with the DataFrame tune on the full grid") {
    tuned.foreach { case ((h, t), (b, r, _, _, _)) =>
      assert(LshTuning.pick(h, t) == (b, r), s"pick($h, $t)")
    }
  }

  test("the banded dedup family's DEFAULT knobs are the tuner's pick") {
    import graft.operators.{Curation, TextDedup}
    val (b, r) = LshTuning.pick(
      TextDedup.defaultNumHashes, TextDedup.defaultMinhashThreshold)
    assert((TextDedup.defaultBands, TextDedup.defaultRowsPerBand) == (b, r))
    assert(TextDedup.defaultNumHashes % TextDedup.defaultBands == 0)
    // the documented operating point (32, 0.5) resolves to 8 x 4 —
    // the committed gates replay exactly this chain, so the derived
    // default must keep landing there unless the operating point moves
    assert((b, r) == (8, 4))
    val d = Curation.BandedMinhash()
    assert((d.numHashes, d.bands, d.threshold) ==
      (TextDedup.defaultNumHashes, TextDedup.defaultBands,
        TextDedup.defaultMinhashThreshold))
  }

  test("pick guards its domain") {
    intercept[IllegalArgumentException](LshTuning.pick(1, 0.5))
    intercept[IllegalArgumentException](LshTuning.pick(32, 0.0))
    intercept[IllegalArgumentException](LshTuning.pick(32, 1.0))
  }
}
