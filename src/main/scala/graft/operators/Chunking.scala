package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — the step that turns variable-length documents
  * into fixed token windows for context-bounded training and
  * retrieval indexing (the sliding-window scheme: window of
  * `windowTokens`, hop of `strideTokens`, so consecutive chunks
  * overlap by `window - stride` tokens).
  *
  * Chunk starts are `0, stride, 2*stride, …` up to the first start
  * whose window reaches the document end — a document shorter than
  * one window yields exactly one chunk, and no chunk is emitted that
  * a previous window already fully covers. All counts are on the
  * whitespace tokenization ([[TextFunctions.tokens]]) shared with the
  * token-count/packing operators, so chunk offsets line up with
  * `pack_offset` accounting downstream.
  *
  * Scale shape: a single stateless per-row projection — tokenize,
  * generate the (bounded) chunk-index sequence, posexplode, slice.
  * No shuffle, no state; output size is input tokens × (window /
  * stride) by construction. Parallelism is the scan's. The explode
  * multiplies rows, not bytes-per-row, so
  * `spark.sql.files.maxPartitionBytes` sizing for the raw corpus
  * still bounds per-task memory (reference capability: none —
  * kafka2delta ships rows as-is; this is the LLM-pipeline extension
  * tier).
  */
object Chunking {

  /** Explode each document into overlapping token-window chunks.
    *
    * Output: `idCol`, `chunk_id` (0-based int), `chunk_start`
    * (token offset, long), `n_tokens` (chunk length, long; only the
    * final chunk of a document may be short), `chunk_text` (the
    * window re-joined with single spaces — chunking normalizes
    * whitespace by construction).
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      strideTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      s"strideTokens must be in [1, windowTokens], got $strideTokens")
    val w = windowTokens
    val s = strideTokens
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // last chunk index: 0 when the doc fits one window, else
      // ceil((n - w) / s) — the first window that reaches the end
      .withColumn("__last",
        greatest(lit(0),
          ceil((col("__n") - w).cast("double") / s.toDouble).cast("int")))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), col("__last"))).as(Seq("chunk_id", "__i")))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id").cast("long") * s).as("chunk_start"),
        size(slice(col("__toks"), col("chunk_id") * s + 1, lit(w))).cast("long")
          .as("n_tokens"),
        array_join(slice(col("__toks"), col("chunk_id") * s + 1, lit(w)), " ")
          .as("chunk_text"))
  }

  /** Exact chunk-level dedup with provenance: group identical chunk
    * texts corpus-wide, keep the canonical occurrence (lowest id,
    * then lowest chunk_id), and report how many places each kept
    * chunk appeared. The chunk-granularity twin of
    * [[TextDedup.dropExactDups]] — catches boilerplate windows that
    * document-level hashing misses. One hash-partitioned aggregation
    * on the chunk fingerprint (map-side combinable); the fingerprint
    * is an md5 so the grouping key is 32 bytes regardless of window
    * size.
    */
  def dedupChunks(chunks: DataFrame, idCol: String): DataFrame =
    chunks
      .groupBy(md5(col("chunk_text")).as("fp"))
      .agg(
        min(struct(col(idCol), col("chunk_id"))).as("keep"),
        count(lit(1)).cast("long").as("occurrences"))
      .select(
        col(s"keep.$idCol").as(idCol),
        col("keep.chunk_id").as("chunk_id"),
        col("occurrences"))
}
