package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the lookup side of a
  * training-data pipeline: "show me the strongest matches for these
  * terms" drives eval-set decontamination audits, targeted corpus
  * inspection, and seed-set expansion. Okapi BM25 with the Lucene
  * positive idf:
  *
  *   idf(t)    = ln((N - df + 0.5) / (df + 0.5) + 1)
  *   score(d)  = SUM_t idf(t) * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl))
  *
  * Scale shape: the index is two projections of the corpus — postings
  * (term, id, tf) from one explode+count, and doc lengths (id, dl)
  * from a map-only `size` — built once, saved partitioned by a term
  * hash prefix. A search touches ONLY the query terms' postings
  * (partition-pruned on disk, an `isin` scan filter in memory), joins
  * them to doc lengths on id (bucket both by id at 100 TB for a
  * shuffle-free sort-merge), and takes top-k via ORDER+LIMIT —
  * Spark plans that as TakeOrderedAndProject, never a global sort.
  * Nothing in the search is proportional to corpus size except the
  * postings rows of the searched terms themselves.
  *
  * Numeric contract (repo-wide integer-space discipline): every
  * per-(doc,term) contribution is floor-quantized to a 1e-6-scaled
  * LONG before the per-doc sum, so ranking and scores are EXACT under
  * any partition order and replay bit-for-bit in SQL — idf/length
  * normalization are IEEE arithmetic over exactly-representable
  * counts, identical on any engine that parses the same literals.
  */
object Bm25 {

  /** Okapi defaults (Robertson; the Lucene/Elasticsearch constants). */
  val K1: Double = 1.2
  val B: Double = 0.75

  /** Scale factor of the quantized per-term contribution. */
  val ScoreScale: Double = 1e6

  /** A built index: `postings` (term, id, tf), `docs` (id, dl), and
    * the exact corpus totals avgdl derives from. `prefixBuckets` is
    * set on loaded indexes: postings then carry a `__tp` partition
    * column and [[search]] prunes the read to the query terms'
    * prefixes.
    */
  final case class Index(
      postings: DataFrame,
      docs: DataFrame,
      nDocs: Long,
      totalDl: Long,
      prefixBuckets: Option[Int] = None) {
    /** avgdl recomputed from the exact totals — identical IEEE
      * division on build and after load, so saved scores replay.
      */
    def avgDl: Double = totalDl.toDouble / nDocs.toDouble
    def unpersist(): Unit = { postings.unpersist(); docs.unpersist(); () }
  }

  /** Build the index: one staged tokenize feeding the postings
    * explode+count and the map-combinable length projection.
    */
  def build(corpus: DataFrame, idCol: String, textCol: String): Index = {
    val toks = TextDedup.spreadToCores(corpus)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .persist()
    val docs = toks.select(col("id"), size(col("toks")).cast("long").as("dl")).persist()
    val postings = toks
      .select(col("id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("id")).agg(count(lit(1)).as("tf"))
      .persist()
    postings.count()
    val totals = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("total")).head()
    toks.unpersist()
    Index(postings, docs, totals.getAs[Long]("n"), totals.getAs[Long]("total"))
  }

  private def hashPrefix(key: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(key), lit(buckets.toLong)).cast("int")

  /** Top-k documents for `queryTerms`, ranked by the quantized BM25
    * sum (ties broken by ascending id — fully deterministic).
    *
    * @return (id, n_terms, score): matched query-term count and the
    *         rounded(4) BM25 score, k rows, best first.
    */
  def search(
      index: Index,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = K1,
      b: Double = B): DataFrame = {
    require(k > 0, "k must be positive")
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val spark = index.postings.sparkSession
    import spark.implicits._
    val terms = queryTerms.distinct
    // Disk-backed index: prune the postings read to the query terms'
    // partitions. The collect is |terms| values computed by a one-job
    // lookup of Spark's own xxhash64 (driver-side reimplementation
    // would risk divergence).
    val matchedAll = index.prefixBuckets match {
      case Some(nb) =>
        val prefixes = terms.toDF("term")
          .select(hashPrefix(col("term"), nb).as("__tp"))
          .distinct().collect().map(_.getInt(0)).toSeq
        index.postings.filter(col("__tp").isin(prefixes: _*)).drop("__tp")
      case None => index.postings
    }
    // The matched postings feed BOTH the df aggregation and the
    // contribution join — staged once so the postings scan (the only
    // corpus-proportional cost in a search) doesn't run twice.
    val matched = matchedAll.filter(col("term").isin(terms: _*)).persist()
    // df per searched term: |terms| rows — broadcast back onto postings.
    val dfreq = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(
      ((lit(index.nDocs) - col("df")).cast("double") + 0.5) /
        (col("df").cast("double") + 0.5) + 1.0)
    val norm = (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / index.avgDl)))
    val contrib = matched
      .join(broadcast(dfreq), Seq("term"))
      .join(index.docs, Seq("id"))
      .select(col("id"), floor(idf * norm * ScoreScale).cast("long").as("lp"))
    TextDedup.materialized(
      contrib.groupBy(col("id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("lp")).as("lp_sum"))
        .orderBy(col("lp_sum").desc, col("id"))
        .limit(k)
        .select(
          col("id"),
          col("n_terms"),
          round(col("lp_sum").cast("double") / lit(ScoreScale), 4).as("score")),
      Seq(matched))
  }

  /** Fold new documents into an index without rebuilding — the
    * [[TextDedup.absorbIntoMinhashStore]] shape: only the INCREMENT is
    * tokenized (one staged pass — postings explode+count and the
    * map-only length projection over the new docs alone; no corpus
    * rescan, no corpus shuffle), then unioned in with the exact totals
    * added. Increment ids must be new to the index (the ingest
    * contract every absorb in this repo shares); postings rows can
    * then never collide, so the result is row-identical to [[build]]
    * over the union corpus and searches score bit-for-bit the same
    * (Bm25Spec's absorb==rebuild differential).
    */
  def absorb(index: Index, increment: DataFrame, idCol: String, textCol: String): Index = {
    val inc = build(increment, idCol, textCol)
    val incPostings = index.prefixBuckets match {
      case Some(nb) => inc.postings.withColumn("__tp", hashPrefix(col("term"), nb))
      case None => inc.postings
    }
    val mergedPostings = index.postings.unionByName(incPostings).persist()
    val mergedDocs = index.docs.unionByName(inc.docs).persist()
    mergedPostings.count()
    mergedDocs.count()
    inc.unpersist()
    Index(mergedPostings, mergedDocs,
      index.nDocs + inc.nDocs, index.totalDl + inc.totalDl, index.prefixBuckets)
  }

  /** [[absorb]] for a PERSISTED index: tokenize the increment, then
    * dynamic-partition-APPEND its postings into the saved term-prefix
    * layout — only the prefixes that receive rows gain files, existing
    * directories are untouched — append the new doc lengths, and
    * rewrite the one-row meta with the summed exact totals. Cost is
    * O(increment); a subsequent [[load]] serves searches over the
    * merged corpus with the same partition-pruned reads.
    */
  def absorbIntoSaved(
      spark: SparkSession,
      path: String,
      increment: DataFrame,
      idCol: String,
      textCol: String): Unit = {
    import spark.implicits._
    // heal a crashed prior rotation BEFORE any read plans resolve —
    // the reads below would throw path-not-found on a store whose
    // live dir is mid-rename, making rotateIn's own heal unreachable
    recoverSaved(spark, path)
    val meta = spark.read.parquet(s"$path/meta").head()
    val nb = meta.getAs[Int]("prefixBuckets")
    val inc = build(increment, idCol, textCol)
    // A previously retracted id may legitimately re-enter the corpus.
    // Its tombstone must clear or load() would filter the fresh rows
    // while the meta rewrite below counts them — but clearing alone
    // would un-mask the id's OLD rows still on disk, so those rows are
    // physically vacuumed first (a targeted rewrite, paid only when a
    // batch actually re-uses a retracted id — rare by construction).
    if (tombstonesExist(spark, path)) {
      val tombs = spark.read.parquet(s"$path/tombstones").select(col("id")).distinct()
        .persist()
      val incIds = inc.docs.select(col("id")).distinct()
      val reused = tombs.join(broadcast(incIds), Seq("id"), "left_semi").persist()
      if (reused.count() > 0) {
        swapTable(spark, path, "postings",
          spark.read.parquet(s"$path/postings")
            .select(col("term"), col("id"), col("tf"), col("__tp"))
            .join(broadcast(reused), Seq("id"), "left_anti"),
          partitioned = true)
        swapTable(spark, path, "docs",
          spark.read.parquet(s"$path/docs").select(col("id"), col("dl"))
            .join(broadcast(reused), Seq("id"), "left_anti"),
          partitioned = false)
        rewriteTombstones(spark, path, tombs.join(broadcast(reused), Seq("id"), "left_anti"))
      }
      reused.unpersist(); tombs.unpersist()
    }
    inc.postings
      .withColumn("__tp", hashPrefix(col("term"), nb))
      .write.mode("append").partitionBy("__tp").parquet(s"$path/postings")
    inc.docs.select(col("id"), col("dl"))
      .write.mode("append").parquet(s"$path/docs")
    Seq((meta.getAs[Long]("nDocs") + inc.nDocs, meta.getAs[Long]("totalDl") + inc.totalDl, nb))
      .toDF("nDocs", "totalDl", "prefixBuckets")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    inc.unpersist()
  }

  /** Replace the tombstone table with `kept` via the rename-aside
    * staged swap ([[rotateIn]]): a complete copy exists under a
    * recoverable name at every instant.
    */
  private def rewriteTombstones(spark: SparkSession, path: String, kept: DataFrame): Unit =
    rotateIn(spark, s"$path/tombstones") { stage =>
      kept.repartition(1).write.mode("overwrite").parquet(stage)
    }

  /** Replace a store table with `rewritten` via the same rename-aside
    * swap: write aside (the rewritten frame reads the very files it
    * replaces), then rotate in.
    */
  private def swapTable(
      spark: SparkSession,
      path: String,
      table: String,
      rewritten: DataFrame,
      partitioned: Boolean): Unit =
    rotateIn(spark, s"$path/$table") { stage =>
      val w = rewritten.write.mode("overwrite")
      (if (partitioned) w.partitionBy("__tp") else w).parquet(stage)
      ()
    }

  /** The rename-aside swap ([[graft.sources.StagedSwap.rotateIn]]):
    * a complete copy of the table exists under a recoverable name at
    * every instant — the delete-then-rename window that could leave NO
    * live table is gone.
    */
  private def rotateIn(spark: SparkSession, livePath: String)(write: String => Unit): Unit =
    graft.sources.StagedSwap.rotateIn(spark, livePath)(write)

  /** Heal a store a crashed [[rotateIn]] left mid-rotation: for each
    * table, restore `__old` (or the complete `__stage`) to live when
    * live is missing and clear stray stage/old dirs. Idempotent; a
    * no-op on a healthy store.
    */
  def recoverSaved(spark: SparkSession, path: String): Unit =
    Seq("postings", "docs", "tombstones")
      .foreach(t => graft.sources.StagedSwap.recover(spark, s"$path/$t"))

  /** Physically drop tombstoned rows from a persisted index and reset
    * the tombstone table — the compaction half of the retract
    * lifecycle, run when lazy anti-join filtering has accumulated
    * enough dead weight (each tombstone broadcast-filters EVERY
    * subsequent pruned read; past a few thousand ids the rewrite pays
    * for itself). Meta is untouched: [[retractFromSaved]] already
    * keeps it at the survivors' exact totals, so searches before and
    * after a vacuum score bit-for-bit the same (Bm25Spec's
    * vacuum==retract differential). Each store table swaps staged
    * (write aside, delete live, rename in) — a reader never sees a
    * half-rewritten table and a crash leaves either the old or the
    * new complete copy.
    *
    * No-op when no tombstones exist.
    */
  def vacuumSaved(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    recoverSaved(spark, path)
    if (!tombstonesExist(spark, path)) return
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tombs = spark.read.parquet(s"$path/tombstones").select(col("id")).distinct()
      .persist()
    tombs.count()
    swapTable(spark, path, "postings",
      spark.read.parquet(s"$path/postings")
        .select(col("term"), col("id"), col("tf"), col("__tp"))
        .join(broadcast(tombs), Seq("id"), "left_anti"),
      partitioned = true)
    swapTable(spark, path, "docs",
      spark.read.parquet(s"$path/docs").select(col("id"), col("dl"))
        .join(broadcast(tombs), Seq("id"), "left_anti"),
      partitioned = false)
    tombs.unpersist()
    fs.delete(new Path(s"$path/tombstones"), true)
    ()
  }

  /** Remove documents from an index without rebuilding — the
    * right-to-be-forgotten half of the ingest lifecycle, and the
    * inverse [[absorb]] deserves because every index statistic is
    * per-(term, doc) rows plus two exact totals: retraction is an
    * anti-join on the removed ids and a subtraction, row-identical to
    * [[build]] over the surviving corpus (Bm25Spec's differential and
    * the `bm25_retract_search` gate both assert it). The removal set
    * broadcasts — deletion batches are curated and small by
    * construction.
    */
  def retract(index: Index, removeIds: DataFrame, idCol: String): Index = {
    val ids = removeIds.select(col(idCol).as("id")).distinct().persist()
    val gone = index.docs.join(ids, Seq("id"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("t")).head()
    val postings = index.postings.join(broadcast(ids), Seq("id"), "left_anti").persist()
    val docs = index.docs.join(broadcast(ids), Seq("id"), "left_anti").persist()
    postings.count(); docs.count()
    ids.unpersist()
    Index(postings, docs,
      index.nDocs - gone.getAs[Long]("n"), index.totalDl - gone.getAs[Long]("t"),
      index.prefixBuckets)
  }

  /** [[retract]] for a PERSISTED index, the Lucene/Delta way: the
    * term-prefix layout is partitioned on the WRONG axis for doc
    * deletion (one doc's postings scatter across every term prefix),
    * so instead of rewriting the store the removed ids append to a
    * TOMBSTONE table and [[load]] anti-joins them out lazily; the one-
    * row meta updates to the survivors' exact totals, so avgdl/idf
    * score as if rebuilt. Fold tombstones away when they accumulate by
    * `save(load(path), path2)` — the compaction half of the cycle.
    */
  def retractFromSaved(
      spark: SparkSession,
      path: String,
      removeIds: DataFrame,
      idCol: String): Unit = {
    import spark.implicits._
    recoverSaved(spark, path)
    val meta = spark.read.parquet(s"$path/meta").head()
    // Overlapping deletion batches are normal in right-to-be-forgotten
    // flows: ids already tombstoned must NOT subtract from the totals
    // again (the physical docs row is still on disk, so the join alone
    // can't tell a live doc from a previously retracted one).
    val raw = removeIds.select(col(idCol).as("id")).distinct()
    val ids = (if (tombstonesExist(spark, path)) {
      raw.join(
        broadcast(spark.read.parquet(s"$path/tombstones").select(col("id")).distinct()),
        Seq("id"), "left_anti")
    } else raw).persist()
    val gone = spark.read.parquet(s"$path/docs").join(ids, Seq("id"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("t")).head()
    ids.write.mode("append").parquet(s"$path/tombstones")
    Seq((meta.getAs[Long]("nDocs") - gone.getAs[Long]("n"),
        meta.getAs[Long]("totalDl") - gone.getAs[Long]("t"),
        meta.getAs[Int]("prefixBuckets")))
      .toDF("nDocs", "totalDl", "prefixBuckets")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    ids.unpersist()
    ()
  }

  private def tombstonesExist(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Persist the index: postings partitioned by a term hash prefix
    * (searches read only the query terms' directories), doc lengths
    * plain, exact totals in a one-row meta parquet.
    */
  def save(index: Index, path: String, prefixBuckets: Int = 64): Unit = {
    require(prefixBuckets > 0, "prefixBuckets must be positive")
    val spark = index.postings.sparkSession
    import spark.implicits._
    index.postings.select(col("term"), col("id"), col("tf"))
      .withColumn("__tp", hashPrefix(col("term"), prefixBuckets))
      .write.mode("overwrite").partitionBy("__tp").parquet(s"$path/postings")
    index.docs.select(col("id"), col("dl"))
      .write.mode("overwrite").parquet(s"$path/docs")
    Seq((index.nDocs, index.totalDl, prefixBuckets))
      .toDF("nDocs", "totalDl", "prefixBuckets")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    // The written frames have any tombstone filter already applied
    // (load() bakes it into the plan), so a leftover tombstone table
    // at the target is stale — it would wrongly re-filter ids a later
    // absorb re-ingests. In-place compaction of a LOADED store is
    // [[vacuumSaved]]; save targets a fresh/other path (overwriting
    // the very files a loaded index reads from is not supported).
    val stale = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(stale)) { fs.delete(stale, true); () }
  }

  /** Load a persisted index; nothing is eagerly cached and searches
    * prune the postings read by partition. Tombstoned ids (from
    * [[retractFromSaved]]) anti-join out lazily — a broadcast filter
    * on the pruned postings read, never a store rewrite.
    */
  def load(spark: SparkSession, path: String): Index = {
    recoverSaved(spark, path)
    val meta = spark.read.parquet(s"$path/meta").head()
    var postings = spark.read.parquet(s"$path/postings")
      .select(col("term"), col("id"), col("tf"), col("__tp"))
    var docs = spark.read.parquet(s"$path/docs").select(col("id"), col("dl"))
    val tombPath = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tombPath)) {
      val tombs = spark.read.parquet(s"$path/tombstones").select(col("id")).distinct()
      postings = postings.join(broadcast(tombs), Seq("id"), "left_anti")
      docs = docs.join(broadcast(tombs), Seq("id"), "left_anti")
    }
    Index(postings, docs,
      meta.getAs[Long]("nDocs"),
      meta.getAs[Long]("totalDl"),
      Some(meta.getAs[Int]("prefixBuckets")))
  }

  /** Exact phrase search via positional-posting intersection — the
    * boolean complement of the BM25 ranker ("find the documents
    * containing THIS exact token sequence"), the primitive behind
    * quote tracing, eval-decontamination audits, and boilerplate
    * hunting.
    *
    * Scale shape: the positional postings are filtered to the phrase's
    * terms BEFORE anything else (an `isin` predicate that reaches the
    * scan — the postings of a handful of terms, a vanishing slice of
    * the corpus), then each term's postings are aligned to the phrase
    * start (`pos - i`) and intersected with |phrase|-1 equi-joins on
    * (doc, start). This is exactly how positional inverted indexes
    * evaluate phrases; the rarest term bounds the join size. Nothing
    * is proportional to corpus size except the matched terms' postings.
    *
    * @return (id, n_matches, first_pos) — first_pos 1-based, docs
    *         containing the phrase at least once
    */
  /** "More like this" — top-k documents by sparse TF-IDF cosine to a
    * query DOCUMENT (doc-to-doc similarity through the inverted
    * index, the retrieval complement of term-query BM25: seed-set
    * expansion, related-content, near-topic audit).
    *
    * Exactness: weights ride an integer milli-idf grid
    * (`tf · (idf_µ div 1000)` — the div keeps squared sums far inside
    * long range at any document length), so dots and norms are exact
    * integer sums; ONE double cosine at the edge, rounded before the
    * deterministic (sim, id) ranking.
    *
    * Scale shape: the weighted posting table is built once (explode +
    * count, map-combinable; the df join is vocabulary-keyed); the
    * query document's terms broadcast (one doc — bounded by
    * construction) and the dot aggregation touches ONLY postings of
    * the query's terms. Top-k is ORDER+LIMIT.
    *
    * @return (id, shared_terms, sim) — k rows, sim rounded to 6
    */
  def moreLikeThis(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryId: Long,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val nDocs = docs.count()
    val tf = TextDedup.spreadToCores(docs)
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idfQ =
      floor(log(lit(nDocs + 1.0) / (col("df").cast("double") + 1.0))
        * lit(Lexicon.IdfScale.toDouble)).cast("long") + lit(Lexicon.IdfScale)
    val w = tf.join(dfT, "term")
      .withColumn("__idfq", idfQ)
      .select(col("id"), col("term"),
        (col("tf") * expr("__idfq div 1000")).as("w"))
      .persist()
    val norms = w.groupBy(col("id"))
      .agg(sum(col("w") * col("w")).as("n2"))
      .persist()
    val qv = w.filter(col("id") === queryId)
      .select(col("term"), col("w").as("wq"))
    val qn = norms.filter(col("id") === queryId).select(col("n2").as("qn2"))
    val out = w.join(broadcast(qv), "term")
      .filter(col("id") =!= queryId)
      .groupBy(col("id"))
      .agg(sum(col("w") * col("wq")).as("dot"),
        count(lit(1)).as("shared_terms"))
      .join(norms, "id")
      .crossJoin(broadcast(qn))
      .select(col("id"), col("shared_terms").cast("long").as("shared_terms"),
        round(col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("qn2").cast("double"))), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
    TextDedup.materialized(out, Seq(w, norms))
  }

  def phraseSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val pos = TextDedup.spreadToCores(docs)
      .select(col(idCol).as("id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__p", "__term")))
      .filter(col("__term").isin(phrase.distinct: _*))
    val aligned = phrase.zipWithIndex.map { case (t, i) =>
      pos.filter(col("__term") === t)
        .select(col("id"), (col("__p") - i).as("__start"))
    }
    aligned
      .reduce((a, b) => a.join(b, Seq("id", "__start")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("__start")) + 1L).as("first_pos"))
  }
}
