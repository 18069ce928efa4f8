package graft

import graft.operators.{CorpusDiff, TextDedup}

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely different content about spark catalyst optimizer internals"),
    (3L, "yet another unrelated string about parquet row groups and page indexes"))
    .toDF("doc_id", "text")

  test("exact store dedup: store dups drop whole increment groups, keep-first within increment") {
    val store = corpus.select(
      graft.functions.TextFunctions.fingerprint($"text").as("fp"))
    val incoming = Seq(
      (10L, "THE  QUICK brown fox jumps over the lazy dog near the river bank"), // store dup (canonical)
      (11L, "a brand new document that the store has never seen"),
      (12L, "a brand new document that the store has never seen"), // in-increment dup of 11
      (13L, "another genuinely new document"))
      .toDF("doc_id", "text")
    val out = TextDedup.exactSurvivorsAgainstStore(incoming, store, "doc_id", "text")
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 13L))
  }

  test("minhash store matching finds the near-dup and only the near-dup") {
    val store = TextDedup.buildMinhashStore(corpus, "doc_id", "text")
    val incoming = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"), // near-dup of 1
      (102L, "entirely novel text with no resemblance to anything stored at all"))
      .toDF("doc_id", "text")
    val matches = TextDedup.minhashAgainstStore(incoming, store, "doc_id", "text")
      .select("id", "store_id").as[(Long, Long)].collect().toSet
    store.unpersist()
    assert(matches.contains((101L, 1L)), s"near-dup not matched: $matches")
    assert(!matches.exists(_._1 == 102L), s"novel doc falsely matched: $matches")
  }

  test("corpus diff classifies all four statuses") {
    val oldSnap = Seq(
      (1L, "doc one"), (2L, "doc two"), (3L, "doc three")).toDF("doc_id", "text")
    val newSnap = Seq(
      (2L, "doc two"), (3L, "doc three EDITED"), (4L, "doc four")).toDF("doc_id", "text")
    val got = CorpusDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    val counts = CorpusDiff.summary(oldSnap, newSnap, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(counts == Map("removed" -> 1L, "unchanged" -> 1L, "changed" -> 1L, "added" -> 1L))
  }
}
