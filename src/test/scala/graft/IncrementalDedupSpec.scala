package graft

import graft.operators.{CorpusDiff, TextDedup}

import org.apache.spark.sql.functions.col

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

  test("removeDupSpans strips only corpus-duplicated windows, reassembles in order") {
    val boiler = "one two three four" // k=3 -> windows of the shared prefix duplicate
    val seeded = Seq(
      (1L, s"$boiler alpha beta gamma"),
      (2L, s"$boiler delta epsilon zeta"),
      (3L, "entirely unique words nothing shared here at all"),
      (4L, "hi there")) // shorter than k: untouched
      .toDF("doc_id", "text")
    val out = TextDedup.removeDupSpans(seeded, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // docs 1 and 2 share windows "one two three" and "two three four":
    // positions 1-4 covered; the window straddling the boundary
    // ("three four alpha" vs "three four delta") is unique per doc
    assert(out(1L).getAs[String]("clean_text") == "alpha beta gamma")
    assert(out(1L).getAs[Long]("removed_tokens") == 4L)
    assert(out(2L).getAs[String]("clean_text") == "delta epsilon zeta")
    assert(out(3L).getAs[Long]("removed_tokens") == 0L)
    assert(out(3L).getAs[String]("clean_text") == "entirely unique words nothing shared here at all")
    assert(out(4L).getAs[Long]("removed_tokens") == 0L)
    assert(out(4L).getAs[String]("clean_text") == "hi there")
  }

  test("removeDupSpans: hashed and string gram keys select identical spans") {
    // real-ish corpus slice: seeded boilerplate + unique tails + a doc
    // with internal repetition, exercising every removal case on both
    // key schemes
    val boiler = "subscribe to our newsletter for all the latest updates"
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon"),
      (2L, s"$boiler zeta eta theta iota kappa"),
      (3L, "a b c d a b c d a b c d"), // self-repeating windows
      (4L, "wholly unique content that shares nothing with the others"),
      (5L, "tiny"))
      .toDF("doc_id", "text")
    val stringKeyed = TextDedup
      .removeDupSpans(docs, "doc_id", "text", k = 4, hashedGramKeys = false)
      .orderBy("id").collect().toSeq
    val hashKeyed = TextDedup
      .removeDupSpans(docs, "doc_id", "text", k = 4, hashedGramKeys = true)
      .orderBy("id").collect().toSeq
    assert(stringKeyed == hashKeyed)
  }

  test("removeDupSpansAgainstStore == full recompute restricted to the increment") {
    val boiler = "subscribe to our newsletter for all the latest updates"
    val corpus = Seq(
      (1L, s"$boiler alpha beta gamma"), // store already carries the boilerplate...
      (2L, "unrelated stored content with many distinct words"),
      (3L, "another stored document entirely"))
      .toDF("doc_id", "text")
    val increment = Seq(
      (101L, s"$boiler delta epsilon"), // ...so ONE new occurrence is already a dup
      (102L, "fresh unique words nothing shared"),
      (103L, "repeated inside increment repeated inside increment")) // self-dup
      .toDF("doc_id", "text")
    for (hashed <- Seq(true, false)) {
      val store = TextDedup.buildSpanStore(corpus, "doc_id", "text", k = 4,
        hashedGramKeys = hashed)
      val incremental = TextDedup
        .removeDupSpansAgainstStore(increment, store, "doc_id", "text")
        .orderBy("id").collect().toSeq
      val full = TextDedup
        .removeDupSpans(corpus.unionByName(increment), "doc_id", "text", k = 4,
          hashedGramKeys = hashed)
        .filter(col("id") >= 100L)
        .orderBy("id").collect().toSeq
      store.unpersist()
      assert(incremental == full, s"hashed=$hashed diverged")
      // the boilerplate prefix really was stripped from the increment doc
      val byId = incremental.map(r => r.getAs[Long]("id") -> r).toMap
      assert(byId(101L).getAs[String]("clean_text") == "delta epsilon")
      assert(byId(102L).getAs[Long]("removed_tokens") == 0L)
    }
  }

  test("span store probe broadcasts the increment grams; the store never shuffles") {
    val corpus = (1L to 30L).map(i => (i, s"stored doc $i with words $i and more $i"))
      .toDF("doc_id", "text")
    val store = TextDedup.buildSpanStore(corpus, "doc_id", "text", k = 3)
    val increment = Seq((100L, "stored doc 1 with fresh tail")).toDF("doc_id", "text")
    val out = TextDedup.removeDupSpansAgainstStore(increment, store, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    store.unpersist()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"store probe not broadcast:\n$plan")
  }

  test("removeDupSpans: a doc that is all boilerplate empties cleanly") {
    val seeded = Seq(
      (1L, "spam spam spam spam"),
      (2L, "spam spam spam spam"))
      .toDF("doc_id", "text")
    val out = TextDedup.removeDupSpans(seeded, "doc_id", "text", k = 4)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getAs[Long]("removed_tokens") == 4L)
      assert(out(id).getAs[String]("clean_text") == "")
    }
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
