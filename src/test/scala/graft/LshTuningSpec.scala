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

  test("pickSized == pick wherever pick's split is feasible (every gate SF)") {
    // the sized tuner must return pick()'s answer EXACTLY whenever
    // pick's split meets the linear FP budget at this corpus size —
    // that is what keeps the oracle-pinned chains byte-identical at
    // gate SFs. The LARGEST gate corpus is sf0.1's docsWithNearDups:
    // 5,100 planted docs (an r18 session believed it was 510, shipped
    // a budget that flipped sf0.1 to (4, 8), and lost 13 pairs vs the
    // oracle — this spec now pins the TRUE gate sizes with margin)
    def pBg(b: Int, r: Int, bg: Double) = 1.0 - foldPow(1.0 - foldPow(bg, r), b)
    for (h <- Seq(32, 64, 128); t <- Seq(0.5, 0.7, 0.9); n <- Seq(0L, 5L, 510L, 5100L)) {
      val (b, r) = LshTuning.pick(h, t)
      val feasible = n.toDouble * n / 2.0 * pBg(b, r, math.max(t - 0.2, 0.01)) <= 512.0 * n
      if (feasible)
        assert(LshTuning.pickSized(h, t, n) == (b, r), s"pickSized($h, $t, n=$n)")
    }
    // the gated operating point, spelled out: 8x4 through the TRUE
    // sf0.1 corpus size and 2x beyond it
    for (n <- Seq(0L, 5L, 510L, 5100L, 10200L))
      assert(LshTuning.pickSized(32, 0.5, n) == (8, 4), s"n=$n")
  }

  test("pickSized deepens rows-per-band ~log n at the pinned (32, 0.5) point") {
    val r1 = LshTuning.pickSized(32, 0.5, 5100)._2     // sf0.1 corpus (true size)
    val r2 = LshTuning.pickSized(32, 0.5, 51000)._2    // sf1 rung
    val r3 = LshTuning.pickSized(32, 0.5, 816000)._2   // sf16 rung
    val r4 = LshTuning.pickSized(32, 0.5, 8160000L)._2 // 10x sf16
    assert(r1 == 4, "gate scale must keep the oracle's 8x4")
    assert(r2 > r1 && r3 >= r2 && r4 > r3,
      s"rows must deepen with n: $r1, $r2, $r3, $r4")
    // every answer is a divisor split of the signature budget
    for (r <- Seq(r1, r2, r3, r4)) assert(32 % r == 0)
  }

  test("pickSized's chosen split meets the linear FP budget when any split can") {
    def pBg(b: Int, r: Int, bg: Double) =
      1.0 - foldPow(1.0 - foldPow(bg, r), b)
    for (n <- Seq(1000L, 100000L, 1000000L, 100000000L)) {
      val (b, r) = LshTuning.pickSized(32, 0.5, n)
      val feasibleExists = (1 to 32).filter(32 % _ == 0).exists { rr =>
        n.toDouble * n / 2.0 * pBg(32 / rr, rr, 0.3) <= 512.0 * n
      }
      if (feasibleExists)
        assert(n.toDouble * n / 2.0 * pBg(b, r, 0.3) <= 512.0 * n,
          s"n=$n chose infeasible ($b, $r)")
    }
  }
}
