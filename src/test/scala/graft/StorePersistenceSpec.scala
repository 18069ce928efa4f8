package graft

import graft.operators.TextDedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Round-trip, directory-pruning, and absorb semantics of the
  * persisted incremental-dedup stores (the MinHash signature/band
  * store and the span gram-count store) — the state a restarted
  * pipeline reloads instead of recomputing corpus-sized work.
  */
class StorePersistenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely different content about spark catalyst optimizer internals"),
    (3L, "yet another unrelated string about parquet row groups and page indexes"))
    .toDF("doc_id", "text")

  private def minhashMatches(incoming: DataFrame, store: TextDedup.MinhashStore): Set[(Long, Long)] =
    TextDedup.minhashAgainstStore(incoming, store, "doc_id", "text")
      .select("id", "store_id").as[(Long, Long)].collect().toSet

  test("minhash store: save -> load round-trips the probe; loaded probe prunes partitions") {
    val store = TextDedup.buildMinhashStore(corpus, "doc_id", "text")
    val incoming = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (102L, "entirely novel text with no resemblance to anything stored at all"))
      .toDF("doc_id", "text")
    val live = minhashMatches(incoming, store)
    assert(live.contains((101L, 1L)) && !live.exists(_._1 == 102L), s"live probe wrong: $live")

    val path = tmpDir("minhash-store")
    TextDedup.saveMinhashStore(store, path, prefixBuckets = 16)
    val loaded = TextDedup.loadMinhashStore(spark, path)
    assert(loaded.prefixBuckets.contains(16))
    assert(minhashMatches(incoming, loaded) == live)

    // the store-side band read must prune at the directory level
    val inBands = loaded.bands.limit(5) // any band-hash sample works as a probe
    val plan = TextDedup.prunedStoreBands(loaded, inBands)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bp"),
      s"expected __bp partition pruning in:\n$plan")
    store.unpersist()
  }

  test("minhash absorb == rebuild over the union; saved append matches in-memory absorb") {
    val store = TextDedup.buildMinhashStore(corpus, "doc_id", "text")
    val survivors = Seq(
      (50L, "entirely novel text with no resemblance to anything stored at all"))
      .toDF("doc_id", "text")
    // probe 2: a near-dup of the absorbed survivor plus one of the base corpus
    val probe = Seq(
      (201L, "entirely novel text with no resemblance to anything stored at all honestly"),
      (202L, "the quick brown fox jumps over the lazy dog near the river bank again"))
      .toDF("doc_id", "text")

    val absorbed = TextDedup.absorbIntoMinhashStore(store, survivors, "doc_id", "text")
    val rebuilt = TextDedup.buildMinhashStore(corpus.unionByName(survivors), "doc_id", "text")
    val gotAbsorbed = minhashMatches(probe, absorbed)
    assert(gotAbsorbed == minhashMatches(probe, rebuilt), "absorb diverged from rebuild")
    assert(gotAbsorbed.contains((201L, 50L)) && gotAbsorbed.contains((202L, 1L)),
      s"expected matches missing: $gotAbsorbed")

    // the same ingest against the persisted layout: dynamic append,
    // then a fresh load probes identically
    val path = tmpDir("minhash-append")
    TextDedup.saveMinhashStore(store, path, prefixBuckets = 16)
    TextDedup.appendToSavedMinhashStore(spark, path, survivors, "doc_id", "text")
    val reloaded = TextDedup.loadMinhashStore(spark, path)
    assert(minhashMatches(probe, reloaded) == gotAbsorbed)
    store.unpersist(); absorbed.unpersist(); rebuilt.unpersist()
  }

  private val boiler = "subscribe to our newsletter for all the latest updates"

  private lazy val spanCorpus = Seq(
    (1L, s"$boiler alpha beta gamma"),
    (2L, "unrelated stored content with many distinct words"),
    (3L, "another stored document entirely"))
    .toDF("doc_id", "text")

  private def spanRows(increment: DataFrame, store: TextDedup.SpanStore): Seq[(Long, Long, Long, String)] =
    TextDedup.removeDupSpansAgainstStore(increment, store, "doc_id", "text")
      .select("id", "n_tokens", "removed_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  test("span store: save -> load round-trips the probe on both key schemes; loaded probe prunes") {
    val increment = Seq(
      (101L, s"$boiler delta epsilon"),
      (102L, "fresh unique words nothing shared"))
      .toDF("doc_id", "text")
    for (hashed <- Seq(false, true)) {
      val store = TextDedup.buildSpanStore(spanCorpus, "doc_id", "text", k = 4,
        hashedGramKeys = hashed)
      val live = spanRows(increment, store)
      val path = tmpDir(s"span-store-$hashed")
      TextDedup.saveSpanStore(store, path, prefixBuckets = 16)
      val loaded = TextDedup.loadSpanStore(spark, path)
      assert(loaded.k == 4 && loaded.hashedGramKeys == hashed && loaded.prefixBuckets.contains(16))
      assert(spanRows(increment, loaded) == live, s"hashed=$hashed round-trip diverged")
      // store-side read must prune at the directory level
      val incKeys = loaded.grams.select(col("gram")).limit(3)
      val plan = TextDedup.prunedStoreGrams(loaded, incKeys)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("__gp"),
        s"expected __gp partition pruning in:\n$plan")
      store.unpersist()
    }
  }

  test("span absorb appends deltas only; probe equals full recompute over the union") {
    val inc1 = Seq(
      (101L, s"$boiler delta epsilon"),
      (102L, "completely fresh words here")).toDF("doc_id", "text")
    val inc2 = Seq(
      (201L, s"$boiler zeta eta"), // boilerplate seen in corpus AND inc1
      (202L, "completely fresh words here too"), // 4-gram overlap with 102
      (203L, "nothing shared at all anywhere")).toDF("doc_id", "text")

    val store = TextDedup.buildSpanStore(spanCorpus, "doc_id", "text", k = 4)
    val absorbed = TextDedup.absorbIntoSpanStore(store, inc1, "doc_id", "text")
    val incremental = spanRows(inc2, absorbed)
    val full = TextDedup
      .removeDupSpans(spanCorpus.unionByName(inc1).unionByName(inc2), "doc_id", "text", k = 4)
      .filter(col("id") >= 200L)
      .select("id", "n_tokens", "removed_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(incremental == full, "absorb-then-probe diverged from full recompute")
    // the shared 4-gram "completely fresh words here" was learned from inc1
    val byId = incremental.map(r => (r._1, r)).toMap
    assert(byId(202L)._3 > 0L, s"inc1-learned boilerplate not stripped: $incremental")
    assert(byId(203L)._3 == 0L)

    // persisted twin: append inc1's deltas to the saved layout, reload, probe
    val path = tmpDir("span-append")
    TextDedup.saveSpanStore(store, path, prefixBuckets = 16)
    TextDedup.appendToSavedSpanStore(spark, path, inc1, "doc_id", "text")
    val reloaded = TextDedup.loadSpanStore(spark, path)
    assert(spanRows(inc2, reloaded) == incremental)
    store.unpersist()
  }
}
