package graft.api

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Clustering, TextDedup}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed (case-class `Encoder`) surface over the engine's core
  * training-data pipeline: compile-time column safety for the call
  * sites an application wires together, DataFrame plans underneath —
  * `.as[T]` is a plan-level cast, so every operator here runs the SAME
  * Catalyst plan as its untyped twin (no extra serialization stage;
  * whole-stage codegen is unaffected).
  *
  * Use the untyped DataFrame API for schema-dynamic work (CDC
  * envelopes, evolving tables); use this module when the schema is a
  * product type the compiler should enforce.
  */
object Typed {

  /** One corpus document (the `documents` table's row type). */
  final case class Document(
      doc_id: Long,
      text: String,
      lang: String,
      source: String,
      n_chars: Long)

  /** A document with its pipeline quality signals. */
  final case class ScoredDocument(
      doc_id: Long,
      text: String,
      lang: String,
      source: String,
      n_chars: Long,
      lang_id: String,
      n_tokens: Long,
      quality: Double,
      keep: Boolean)

  /** One near-duplicate candidate pair (MinHash-estimated Jaccard). */
  final case class DupPair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** A document's duplicate-component label. */
  final case class ClusterLabel(id: Long, cluster: Long)

  /** One embedding row (the `embeddings` table's row type). */
  final case class EmbeddingRow(vec_id: Long, embedding: Array[Float], label: Int)

  /** A scored neighbor from a similarity search. */
  final case class Neighbor(vec_id: Long, score: Double)

  /** Read the documents table as a typed Dataset. */
  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    graft.sources.Tables(spark, sfDir, "documents").as[Document]
  }

  /** Read the embeddings table as a typed Dataset. */
  def embeddings(spark: SparkSession, sfDir: String): Dataset[EmbeddingRow] = {
    import spark.implicits._
    graft.sources.Tables(spark, sfDir, "embeddings").as[EmbeddingRow]
  }

  /** Quality/language scoring: one codegen'd scan, no shuffle. */
  def score(docs: Dataset[Document]): Dataset[ScoredDocument] = {
    import docs.sparkSession.implicits._
    docs.toDF()
      .withColumn("lang_id", TextFunctions.langId(col("text")))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("keep", TextFunctions.gopherKeep(TextFunctions.tokens(col("text"))))
      .as[ScoredDocument]
  }

  /** MinHash+LSH near-duplicate candidate pairs (bucketed, guarded —
    * see [[TextDedup.minhashCandidatePairs]] for the scale shape).
    */
  def nearDupPairs(docs: Dataset[Document]): Dataset[DupPair] = {
    import docs.sparkSession.implicits._
    TextDedup.minhashCandidatePairs(docs.toDF(), "doc_id", "text").as[DupPair]
  }

  /** Duplicate components from candidate pairs (min-label
    * propagation); labels every paired doc with its component minimum.
    */
  def components(pairs: Dataset[DupPair]): Dataset[ClusterLabel] = {
    import pairs.sparkSession.implicits._
    Clustering.connectedComponents(pairs.toDF(), "id_a", "id_b").as[ClusterLabel]
  }

  /** Keep-one-per-component + quality gate: the end-to-end typed
    * dedup. Documents outside any component are their own survivor.
    */
  def dedupedKeepSet(docs: Dataset[Document]): Dataset[ScoredDocument] = {
    val scored = score(docs)
    import scored.sparkSession.implicits._
    val labels = components(nearDupPairs(docs)).toDF()
    scored.toDF()
      .join(labels, col("doc_id") === col("id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster")).orderBy(col("doc_id"))))
      .filter(col("__rk") === 1 && col("keep"))
      .drop("id", "cluster", "__rk")
      .as[ScoredDocument]
  }

  /** Brute-force cosine top-k against a query vector, typed. */
  def topK(emb: Dataset[EmbeddingRow], query: Array[Float], k: Int): Dataset[Neighbor] = {
    import emb.sparkSession.implicits._
    val q = lit(query)
    emb.toDF()
      .select(
        col("vec_id"),
        VectorFunctions.cosine(col("embedding"), q).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
      .as[Neighbor]
  }

  /** A document's train/val/test assignment. */
  final case class SplitAssignment(doc_id: Long, split: String)

  /** Deterministic hash-ranged split assignment, typed
    * ([[graft.operators.Sampling.hashSplit]] semantics: append-stable,
    * shuffle-free).
    */
  def splitAssignments(
      docs: Dataset[Document],
      splits: Seq[(String, Int)]): Dataset[SplitAssignment] = {
    import docs.sparkSession.implicits._
    graft.operators.Sampling.hashSplit(docs.toDF(), Seq("doc_id"), splits)
      .select(col("doc_id"), col("split"))
      .as[SplitAssignment]
  }

  /** A document flagged against an eval set. */
  final case class ContaminationFlag(
      id: Long, n_grams: Long, eval_hits: Long, contaminated: Boolean)

  /** Benchmark decontamination, typed
    * ([[graft.operators.Decontamination.flagContaminated]]).
    */
  def contamination(
      docs: Dataset[Document],
      evalSet: Dataset[Document],
      n: Int = 8): Dataset[ContaminationFlag] = {
    import docs.sparkSession.implicits._
    graft.operators.Decontamination
      .flagContaminated(docs.toDF(), evalSet.toDF(), "doc_id", "text", n)
      .as[ContaminationFlag]
  }

  /** A document surviving the per-domain quota, with its domain and
    * deterministic rank inside it.
    */
  final case class DomainCapped(
      doc_id: Long,
      text: String,
      lang: String,
      source: String,
      n_chars: Long,
      domain: String,
      rk: Int)

  /** Per-domain document quota, typed
    * ([[graft.operators.DomainOps.capPerDomain]]; the domain is derived
    * from `urlOf` applied to each document).
    */
  def domainCapped(
      docs: Dataset[Document],
      urlOf: org.apache.spark.sql.Column,
      cap: Int): Dataset[DomainCapped] = {
    import docs.sparkSession.implicits._
    graft.operators.DomainOps
      .capPerDomain(docs.toDF(), graft.operators.DomainOps.extractDomain(urlOf),
        "doc_id", cap)
      .as[DomainCapped]
  }

  /** A span-deduplicated document: token counts plus the reassembled
    * clean text.
    */
  final case class SpanCleaned(
      id: Long, n_tokens: Long, removed_tokens: Long, clean_text: String)

  /** Span-level exact-substring dedup, typed
    * ([[TextDedup.removeDupSpans]] semantics and scale shape).
    */
  def spanCleaned(docs: Dataset[Document], k: Int): Dataset[SpanCleaned] = {
    import docs.sparkSession.implicits._
    TextDedup.removeDupSpans(docs.toDF(), "doc_id", "text", k).as[SpanCleaned]
  }

  /** One adjacent-suffix repeat: the lower-ranked suffix, the one
    * after it, and their common prefix length in tokens.
    */
  final case class RepeatedSpan(
      doc_a: Long, pos_a: Long, doc_b: Long, pos_b: Long, lcp: Long)

  /** Suffix-array repeated-passage discovery, typed
    * ([[graft.operators.SuffixArray.repeatedSpans]] semantics: every
    * passage occurring twice at >= minLen tokens, no shingle size
    * fixed in advance). Builds and releases the index internally —
    * use the untyped operator to keep the index for further probes.
    */
  def repeatedSpans(docs: Dataset[Document], minLen: Long): Dataset[RepeatedSpan] = {
    import docs.sparkSession.implicits._
    val ix = graft.operators.SuffixArray.build(docs.toDF(), "doc_id", "text")
    val out = graft.operators.SuffixArray.repeatedSpans(ix, minLen).as[RepeatedSpan]
    out.persist().count()
    ix.unpersist()
    out
  }

  /** One mined parallel pair with its µ-grid similarity and margin. */
  final case class MinedPair(
      src_id: Long, tgt_id: Long, sim_micro: Long, margin_micro: Long)

  /** Ratio-margin bitext mining over two typed embedding sides
    * ([[graft.operators.BitextMine.marginMine]] semantics and guard).
    */
  def minePairs(
      src: Dataset[EmbeddingRow],
      tgt: Dataset[EmbeddingRow],
      k: Int,
      minMarginMicro: Long): Dataset[MinedPair] = {
    import src.sparkSession.implicits._
    graft.operators.BitextMine
      .marginMine(src.toDF(), tgt.toDF(), "vec_id", "embedding", k, minMarginMicro,
        simFn = (a, b) => floor(VectorFunctions.cosineDecimal(a, b) * lit(1e6)).cast("long"))
      .as[MinedPair]
  }

  /** A node's cohesion profile in the duplicate graph. */
  final case class NodeCohesion(id: Long, degree: Long, triangles: Long, lcc_micro: Long)

  /** Local clustering coefficients over a typed pair set
    * ([[graft.operators.Graphs.clusteringCoefficient]]).
    */
  def cohesion(pairs: Dataset[DupPair]): Dataset[NodeCohesion] = {
    import pairs.sparkSession.implicits._
    graft.operators.Graphs
      .clusteringCoefficient(pairs.toDF(), "id_a", "id_b")
      .as[NodeCohesion]
  }
}
