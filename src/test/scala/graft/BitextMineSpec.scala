package graft

import graft.operators.BitextMine

import org.apache.spark.sql.functions._

/** Margin-based bitext mining: closed-form margins on a hand-built
  * candidate table, hub suppression (the property plain cosine
  * thresholds lack), mutual-best filtering, and the broadcast guard.
  */
class BitextMineSpec extends SparkSpec {
  import spark.implicits._

  test("closed-form margins and mutual-best filtering on a tiny candidate table") {
    // src 1 pairs tgt 10 strongly; src 2 and tgt 11 prefer each other;
    // tgt 12 is nobody's best
    val cand = Seq(
      (1L, 10L, 900000L), (1L, 11L, 400000L), (1L, 12L, 300000L),
      (2L, 10L, 500000L), (2L, 11L, 800000L), (2L, 12L, 350000L))
      .toDF("src_id", "tgt_id", "sim")
    val got = BitextMine.marginMineFromCandidates(cand, k = 2, minMarginMicro = 0L)
      .orderBy(col("src_id"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // closed form for (1,10): fwd top2 = 900k+400k, bwd top2 = 900k+500k
    // margin = 900000*2e6*2*2 div (1300000*2 + 1400000*2)
    val m110 = 900000L * 2000000L * 4 / (1300000L * 2 + 1400000L * 2)
    val m211 = 800000L * 2000000L * 4 / (1300000L * 2 + 1200000L * 2)
    assert(got == Seq((1L, 10L, 900000L, m110), (2L, 11L, 800000L, m211)), s"got $got")
  }

  test("ratio margin suppresses a hub that plain cosine would pair") {
    // tgt 99 is a HUB: similarity 700k to every source; each source
    // also has a genuine partner at 750k that stands out
    val cand = (1L to 4L).flatMap { s =>
      Seq((s, 99L, 700000L), (s, 100L + s, 750000L)) ++
        (1L to 4L).filter(_ != s).map(o => (s, 100L + o, 100000L))
    }.toDF("src_id", "tgt_id", "sim")
    val got = BitextMine.marginMineFromCandidates(cand, k = 4, minMarginMicro = 1000000L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)).toSet ==
      (1L to 4L).map(s => (s, 100L + s)).toSet,
      s"hub leaked or partner missed: $got")
    // the hub's backward average is dragged up by serving everyone, so
    // no emitted pair involves it
    assert(!got.exists(_._2 == 99L))
  }

  test("sides smaller than k average over what exists") {
    val cand = Seq((1L, 10L, 600000L)).toDF("src_id", "tgt_id", "sim")
    val got = BitextMine.marginMineFromCandidates(cand, k = 8, minMarginMicro = 0L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // one candidate: both averages equal the sim itself, margin = 1.0
    assert(got == Seq((1L, 10L, 600000L, 1000000L)), s"got $got")
  }

  test("negative sims are legal input: pruned by margin, never raised on") {
    // raw-cosine candidates go negative routinely (anti-correlated
    // vectors); they must flow through — below any positive margin —
    // without tripping validation (the round-12 bitext_mine regression)
    val cand = Seq(
      (1L, 10L, 900000L), (1L, 11L, -400000L), (1L, 12L, -96767L),
      (2L, 10L, -500000L), (2L, 11L, 800000L), (2L, 12L, -350000L))
      .toDF("src_id", "tgt_id", "sim")
    val got = BitextMine.marginMineFromCandidates(cand, k = 2, minMarginMicro = 1000000L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 10L), (2L, 11L)),
      s"negative-sim candidates broke mining: $got")
    assert(!got.exists(_._3 < 0), s"a negative-sim pair was mined: $got")
    // the hard contract is opt-in: validate = true raises on the same input
    val e = intercept[Exception] {
      BitextMine.marginMineFromCandidates(cand, k = 2, minMarginMicro = 0L,
        validate = true).collect()
    }
    assert(e.getMessage.contains("non-negative"), s"got ${e.getMessage}")
  }

  test("broadcast mine finds planted translations through the guard path") {
    val src = (0L until 8L).map(i =>
      (i, Seq.tabulate(8)(j => if (j == i) 1.0f else 0.05f))).toDF("id", "vec")
    val tgt = (0L until 8L).map(i =>
      (i + 100L, Seq.tabulate(8)(j => if (j == i) 0.95f else 0.06f))).toDF("id", "vec")
    val simFn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column =
      (a, b) => floor(graft.functions.VectorFunctions.cosineDecimal(a, b) * lit(1e6))
        .cast("long")
    val got = BitextMine.marginMine(src, tgt, "id", "vec", k = 3,
      minMarginMicro = 1000000L, simFn = simFn)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)).toSet ==
      (0L until 8L).map(i => (i, i + 100L)).toSet, s"got $got")
    val e = intercept[IllegalArgumentException] {
      BitextMine.marginMine(src, tgt, "id", "vec", k = 3,
        minMarginMicro = 0L, simFn = simFn, maxBroadcastNodes = 4)
    }
    assert(e.getMessage.contains("marginMineFromCandidates"))
  }
}
