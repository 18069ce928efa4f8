package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a cleaned corpus and a training
  * run: documents are laid head-to-tail in a deterministic order and
  * cut into fixed token-budget packs (the "concat and chunk" scheme).
  *
  * Exact greedy bin packing (reset the counter whenever a document
  * would overflow) is inherently sequential; the chunk form is the
  * standard distributed approximation — a document astride a boundary
  * is split/truncated at tensorization time, and the pack id is a pure
  * function of the data.
  *
  * Scale shape: packing runs per SHARD (`pmod(id, shards)`), so the
  * running-sum window is `shards`-way parallel — there is never a
  * single-partition global sort. Pick `shards` ≈ the number of
  * training data-loader workers; determinism holds for any value.
  */
object Packing {

  /** Assign every row a (shard, pack_id) plus its token offset within
    * the pack stream.
    *
    * @param tokenCol  token count column (e.g.
    *                  `TextFunctions.tokenCount(col("text"))`)
    * @param orderHash deterministic shuffle order within a shard;
    *                  defaults to `xxhash64(id)`. Pass an md5-based
    *                  column for cross-engine replay.
    */
  def packChunks(
      df: DataFrame,
      idCol: String,
      tokenCol: Column,
      budgetTokens: Long,
      shards: Int,
      orderHash: Option[Column] = None): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(shards > 0, "shards must be positive")
    val h = orderHash.getOrElse(xxhash64(col(idCol)))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("__h", h)
      .withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("pack_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id",
        floor(col("pack_offset").cast("double") / budgetTokens.toDouble).cast("long"))
      .drop("__h")
  }

  /** Per-pack statistics: document count, packed tokens, fill ratio
    * against the budget (the training-efficiency number packing
    * exists to maximize).
    */
  def packStats(packed: DataFrame, budgetTokens: Long): DataFrame =
    packed.groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("tokens"))
      .withColumn("fill", round(col("tokens").cast("double") / budgetTokens.toDouble, 4))
}
