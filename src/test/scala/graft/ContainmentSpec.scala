package graft

import graft.operators.TextDedup

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("a strict prefix scores containment 1.0 while Jaccard would be ~0.5") {
    val full = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val half = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, full), (2L, half),
      (3L, "unrelated words entirely different content here now")).toDF("id", "text")
    val got = TextDedup.containmentPairs(docs, "id", "text",
      shingleSize = 3, maxDf = 5, minContainMicro = 800000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
    assert(got == Seq((1L, 2L, 1000000L)), s"got $got")
  }

  test("stop-grams above maxDf generate no candidate pairs") {
    // the shared trigram appears in ALL four docs -> df 4 > maxDf 3
    val docs = (1L to 4L).map(i => (i, s"common shared trigram unique$i tail$i"))
      .toDF("id", "text")
    val got = TextDedup.containmentPairs(docs, "id", "text",
      shingleSize = 3, maxDf = 3, minContainMicro = 1L)
    assert(got.count() == 0L)
  }

  test("sizes count only grams with df in [2, maxDf]") {
    // doc 1 and 2 share 'a b c'; doc 1 has a singleton gram that must
    // not count toward sz_a (else containment of the pure overlap < 1)
    val docs = Seq((1L, "a b c solo1 solo2 solo3"), (2L, "a b c")).toDF("id", "text")
    val row = TextDedup.containmentPairs(docs, "id", "text",
      shingleSize = 3, maxDf = 5, minContainMicro = 1L).head()
    assert(row.getLong(2) == 1L) // common: the single shared trigram
    assert(row.getLong(3) == 1L) // sz_a: singletons pruned
    assert(row.getLong(4) == 1L)
    assert(row.getLong(5) == 1000000L)
  }
}
