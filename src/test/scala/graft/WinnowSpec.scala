package graft

import graft.operators.Winnow

import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 5
  private val w = 4

  private def fpsOf(text: String): Set[Long] =
    Winnow.fingerprints(Seq((1L, text)).toDF("id", "text"), "id", "text", k, w)
      .select("fp").collect().map(_.getLong(0)).toSet

  test("winnowing guarantee: a shared run of length >= k + w - 1 shares a fingerprint") {
    val shared = "abcdefgh" // length k + w - 1 = 8
    val a = fpsOf(s"xxxx $shared yyyy")
    val b = fpsOf(s"qqqqqq $shared zzz")
    assert(a.intersect(b).nonEmpty,
      "any window covering the shared run must select a shared minimum")
  }

  test("density: winnowed set is much smaller than the gram count") {
    val text = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val grams = text.length - k + 1
    val fps = fpsOf(text).size
    assert(fps < grams / 2,
      s"winnowing must compress the $grams grams, got $fps fingerprints")
  }

  test("short documents still fingerprint: below one window, below one gram") {
    assert(fpsOf("ab").size == 1, "shorter than k -> whole text is the one gram")
    assert(fpsOf("abcdef").size == 1, "fewer than w grams -> single minimum")
  }

  test("both hash schemes agree on set relationships (portable vs xxhash64)") {
    val df = Seq((1L, "shared winnow prefix one"), (2L, "shared winnow prefix two"))
      .toDF("id", "text")
    for (scheme <- Seq(Winnow.PortableMd5Hash, Winnow.Xxhash64Hash)) {
      val inv = Winnow.fingerprints(df, "id", "text", k, w, scheme)
        .groupBy("fp").agg(count(lit(1)).as("n"))
      assert(inv.filter(col("n") === 2).count() > 0,
        "the shared 19-char prefix must yield shared fingerprints under both schemes")
    }
  }

  test("overlapPairs finds planted near-duplicates and honors minShared") {
    val base = "a long enough document body that yields plenty of winnowed fingerprints " +
      "for overlap detection in this unit test corpus"
    val docs = Seq(
      (0L, base),
      (1L, base + " with a small appended tail"),
      (2L, "completely different content nothing in common whatsoever here at all"))
      .toDF("id", "text")
    val pairs = Winnow.overlapPairs(docs, "id", "text", k, w, minShared = 5)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((0L, 1L)))
    pairs.unpersist()
    val strict = Winnow.overlapPairs(docs, "id", "text", k, w, minShared = 100000)
    assert(strict.collect().isEmpty, "an unreachable minShared returns nothing")
    strict.unpersist()
  }

  test("bucket guard: a fingerprint shared by too many docs generates no pairs") {
    val boiler = "identical boilerplate text appearing in every single document body"
    val docs = (0L until 5L).map(i => (i, boiler)).toDF("id", "text")
    val guarded = Winnow.overlapPairs(docs, "id", "text", k, w,
      minShared = 1, maxBucketSize = 4)
    assert(guarded.collect().isEmpty,
      "every fingerprint lives in 5 docs > maxBucketSize=4 -> all dropped")
    guarded.unpersist()
  }
}
