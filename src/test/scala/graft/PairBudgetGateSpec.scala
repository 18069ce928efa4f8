package graft

import graft.operators.TextDedup

import org.apache.spark.sql.functions._

/** The GLOBAL candidate-pair pre-count gate (r17 review #7): a
  * collision-heavy corpus whose buckets are individually under the
  * per-bucket budget must FAIL LOUDLY with the measured pair count —
  * the 8×4 sf16 failure mode was an OOM with every per-bucket guard
  * green. Under the budget the gate must be invisible (same pairs,
  * same schema).
  */
class PairBudgetGateSpec extends SparkSpec {
  import spark.implicits._

  // 12 docs in 3 IDENTICAL-text families: identical shingle sets mean
  // identical signatures, so each family shares a bucket in EVERY band
  // (deterministically), and candidate pairs spread across many
  // individually-tiny buckets — the exact shape that starved the 8×4
  // form at sf16 with every per-bucket guard green
  private def corpus = (0 until 12).map { i =>
    val fam = i % 3
    (i.toLong, s"family $fam the quick brown fox jumps over the lazy dog " +
      "again and again while everyone watches quietly from the fence")
  }.toDF("doc_id", "text")

  test("over-budget corpora raise loudly with the measured pair count, not OOM") {
    val e = intercept[Throwable] {
      TextDedup.minhashCandidatePairs(corpus, "doc_id", "text",
        maxTotalPairs = 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString("\n")
    assert(all.contains("maxTotalPairs=1"), s"unexpected error: $all")
    assert(all.contains("candidate pairs"), s"unexpected error: $all")
  }

  test("under the budget the gate is invisible: identical pairs either way") {
    val loose = TextDedup.minhashCandidatePairs(corpus, "doc_id", "text")
      .orderBy(col("id_a"), col("id_b")).collect().toSeq
    val tight = TextDedup.minhashCandidatePairs(corpus, "doc_id", "text",
      maxTotalPairs = 1000L)
      .orderBy(col("id_a"), col("id_b")).collect().toSeq
    assert(loose.nonEmpty, "fixture must produce candidate pairs")
    assert(loose == tight)
  }

  test("an EMPTY candidate stage passes the gate with zero pairs") {
    // regression (r18): sum() over zero admitted buckets is NULL, which
    // the gate read as the overflow sentinel and raised — an
    // all-gate-dropped first streaming batch died with a null-message
    // USER_RAISED_EXCEPTION instead of bootstrapping an empty store
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val pairs = TextDedup.minhashCandidatePairs(empty, "doc_id", "text",
      maxTotalPairs = 1L).collect()
    assert(pairs.isEmpty)
  }

  test("boundedBucketKeys admits per-bucket-compliant keys and keeps key columns") {
    val counts = Seq(("k1", 10L), ("k2", 3L), ("k3", 3000L))
      .toDF("key", "__n")
    val admitted = TextDedup.boundedBucketKeys(
      counts, "__n", maxBucketPairs = 1999000L, maxTotalPairs = 1000000L,
      what = "spec")
      .as[String].collect().sorted.toSeq
    // k3 is over the per-bucket budget (3000*2999/2 > 1999000) and is
    // DROPPED (the documented mega-bucket semantics); k1/k2 pass and
    // their total (45 + 3 pairs) clears the global gate
    assert(admitted == Seq("k1", "k2"))
  }
}
