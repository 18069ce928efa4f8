package graft

import graft.api.Typed
import graft.api.Typed.{Document, EmbeddingRow}

/** The typed Dataset facade: compile-time row types over the same
  * Catalyst plans as the untyped operators.
  */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    Document(1L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "web", 63L),
    Document(2L, "the quick brown fox jumps over the lazy dog near the river bank!", "en", "web", 64L),
    Document(3L, "catalyst optimizer rules rewrite logical plans before physical planning", "en", "web", 71L),
    Document(4L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "web", 63L),
    Document(5L, "parquet row groups carry min max statistics for scan pruning", "en", "web", 60L)).toDS()

  test("score returns typed quality signals on one scan") {
    val scored = Typed.score(docs).collect().map(d => d.doc_id -> d).toMap
    assert(scored(1L).lang_id == "en")
    assert(scored(1L).n_tokens == 13L)
    assert(scored.values.forall(d => d.quality >= 0.0 && d.quality <= 1.0))
    assert(scored(3L).keep, "clean technical prose passes the gate")
  }

  test("nearDupPairs + components label the duplicate family") {
    val labels = Typed.components(Typed.nearDupPairs(docs))
      .collect().map(l => l.id -> l.cluster).toMap
    // docs 1, 2, 4 are one family labeled by the minimum id
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(4L) == 1L)
    assert(!labels.contains(3L) && !labels.contains(5L), "unique docs are unlabeled")
  }

  test("dedupedKeepSet keeps one quality-passing survivor per family") {
    val kept = Typed.dedupedKeepSet(docs).collect().map(_.doc_id).toSet
    assert(!kept.contains(2L) && !kept.contains(4L), "dup family must keep only doc 1")
    assert(kept.subsetOf(Set(1L, 3L, 5L)))
  }

  test("splitAssignments covers every doc with a valid split name") {
    val got = Typed.splitAssignments(docs, Seq(("train", 3), ("test", 1))).collect()
    assert(got.map(_.doc_id).toSet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got.forall(a => a.split == "train" || a.split == "test"))
  }

  test("contamination flags the docs sharing grams with the eval set") {
    val evalSet = Seq(
      Document(100L, "the quick brown fox jumps", "en", "eval", 25L)).toDS()
    val flags = Typed.contamination(docs, evalSet, n = 4)
      .collect().map(f => f.id -> f.contaminated).toMap
    assert(flags(1L) && flags(2L) && flags(4L))
    assert(!flags(3L) && !flags(5L))
  }

  test("domainCapped keeps the quota per derived domain") {
    import org.apache.spark.sql.functions._
    val url = concat(lit("https://"), col("source"), lit(".example.com/"),
      col("doc_id").cast("string"))
    val kept = Typed.domainCapped(docs, url, cap = 2).collect()
    assert(kept.length == 2)
    assert(kept.forall(_.domain == "web.example.com"))
    assert(kept.forall(_.rk <= 2))
  }

  test("spanCleaned strips corpus-duplicated windows, typed") {
    val cleaned = Typed.spanCleaned(docs, k = 8).collect().map(c => c.id -> c).toMap
    // docs 1 and 4 are identical; 2 differs only by punctuation in the
    // last token — their shared 8-token windows are boilerplate
    assert(cleaned(1L).removed_tokens > 0L)
    assert(cleaned(4L).removed_tokens > 0L)
    assert(cleaned(3L).removed_tokens == 0L)
    assert(cleaned(5L).removed_tokens == 0L)
  }

  test("topK returns typed neighbors in score order") {
    val emb = Seq(
      EmbeddingRow(0L, Array(1f, 0f, 0f), 0),
      EmbeddingRow(1L, Array(0.9f, 0.1f, 0f), 0),
      EmbeddingRow(2L, Array(0f, 1f, 0f), 1)).toDS()
    val top = Typed.topK(emb, Array(1f, 0f, 0f), 2).collect()
    assert(top.map(_.vec_id).toSeq == Seq(0L, 1L))
    assert(top.head.score > top(1).score)
  }

  test("repeatedSpans surfaces the shared passage, typed") {
    val spans = Typed.repeatedSpans(docs, minLen = 10).collect()
    // docs 1, 2, 4 share the 13-token sentence prefix
    assert(spans.nonEmpty)
    assert(spans.forall(sp => Set(1L, 2L, 4L).contains(sp.doc_a) &&
      Set(1L, 2L, 4L).contains(sp.doc_b)), s"unexpected pair: ${spans.toSeq}")
    assert(spans.exists(_.lcp >= 13L), s"full shared prefix missed: ${spans.toSeq}")
  }

  test("minePairs mines the planted translation, typed") {
    val src = (0 until 6).map(i =>
      EmbeddingRow(i.toLong, Array.tabulate(6)(j => if (j == i) 1.0f else 0.1f), 0)).toDS()
    val tgt = (0 until 6).map(i =>
      EmbeddingRow(i + 100L, Array.tabulate(6)(j => if (j == i) 0.9f else 0.11f), 0)).toDS()
    val got = Typed.minePairs(src, tgt, k = 3, minMarginMicro = 1000000L)
      .collect().map(p => p.src_id -> p.tgt_id).toMap
    assert(got == (0 until 6).map(i => i.toLong -> (i + 100L)).toMap, s"got $got")
  }

  test("cohesion separates a clique member from a hub, typed") {
    val pairs = (Seq((1L, 2L), (1L, 3L), (2L, 3L)) ++ // triangle
      Seq((9L, 10L), (9L, 11L), (9L, 12L)))           // star hub
      .map { case (a, b) => Typed.DupPair(a, b, 1.0) }.toDS()
    val got = Typed.cohesion(pairs).collect().map(c => c.id -> c.lcc_micro).toMap
    assert(got(1L) == 1000000L && got(9L) == 0L, s"got $got")
  }
}
