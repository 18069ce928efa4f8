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

  /** Length-bucketed batching plan — the padding-waste ledger: each
    * sequence rounds up to the smallest power-of-two bucket holding
    * it, and per bucket the plan reports how many padded tokens a
    * batch at that length costs versus the real tokens carried.
    * Bucketing by explicit boundary comparison (a `when` ladder, no
    * `log2` — libm rounding at exact powers of two differs across
    * engines) keeps the assignment integer-exact and SQL-replayable.
    * One projection + one aggregation; this is the planner step
    * before dataloader sharding, where a 2x padding-waste bucket is
    * the difference between feeding accelerators and feeding zeros.
    *
    * @return (bucket_size, n_seqs, total_tokens, padded_tokens,
    *         waste_pct) ascending by bucket; sequences beyond
    *         `maxBucket` clamp into it (truncation is tensorization
    *         policy, not this planner's)
    */
  def lengthBuckets(
      df: DataFrame,
      tokenCol: Column,
      minBucket: Int = 16,
      maxBucket: Int = 1024): DataFrame = {
    require(Integer.bitCount(minBucket) == 1 && Integer.bitCount(maxBucket) == 1 &&
      minBucket < maxBucket, "buckets must be powers of two, min < max")
    val sizes = Iterator.iterate(minBucket)(_ * 2).takeWhile(_ <= maxBucket).toSeq
    val bucket = sizes.init.foldRight(lit(maxBucket.toLong)) {
      case (b, rest) => when(tokenCol <= b, lit(b.toLong)).otherwise(rest)
    }
    df.select(tokenCol.cast("long").as("__n"), bucket.as("bucket_size"))
      .groupBy(col("bucket_size"))
      .agg(
        count(lit(1)).as("n_seqs"),
        sum(least(col("__n"), col("bucket_size"))).as("total_tokens"))
      .select(
        col("bucket_size"),
        col("n_seqs").cast("long").as("n_seqs"),
        col("total_tokens").cast("long").as("total_tokens"),
        (col("n_seqs") * col("bucket_size")).cast("long").as("padded_tokens"),
        round((col("n_seqs") * col("bucket_size") - col("total_tokens")).cast("double") /
          (col("n_seqs") * col("bucket_size")), 4).as("waste_pct"))
      .orderBy(col("bucket_size"))
  }

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

  /** TOKEN-BALANCED shard plan — the complement of [[packChunks]]:
    * where packChunks packs within FIXED shards (`pmod(id, shards)`,
    * whose token totals track the data), this cuts the whole corpus
    * into shards of ~`budgetTokens` each — the uniform-shard-size
    * contract training dataloaders want, computed WITHOUT a global
    * single-task sort.
    *
    * Canonical packing order is (orderBucket, id); the global running
    * token sum decomposes into a per-bucket cumulative window (one
    * window partition per bucket — `orderBuckets`-way parallel) plus a
    * bucket-offset prefix sum over `orderBuckets` rows (a bounded
    * single-partition window, the same size class as a broadcast
    * side). `shard = tokensBefore div budgetTokens`, so every shard
    * except the last provably carries `budgetTokens ± (maxDocTokens -
    * 1)` tokens — the balance verdict gate queries assert.
    *
    * @param bucketOf deterministic order bucket in [0, orderBuckets);
    *                 defaults to `pmod(xxhash64(id), orderBuckets)`.
    *                 Pass an md5-derived bucket for cross-engine
    *                 replay (the [[packChunks]] orderHash convention).
    * @return (idCol, n_tokens, shard)
    */
  def shardPlan(
      df: DataFrame,
      idCol: String,
      tokenCol: Column,
      budgetTokens: Long,
      orderBuckets: Int = 256,
      bucketOf: Option[Column] = None): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(orderBuckets > 0, "orderBuckets must be positive")
    val b = bucketOf.getOrElse(pmod(xxhash64(col(idCol)), lit(orderBuckets.toLong)))
    val base = df.select(col(idCol), tokenCol.cast("long").as("n_tokens"))
      .withColumn("__b", b)
    val inBucket = base.withColumn("__cum_in",
      sum(col("n_tokens"))
        .over(Window.partitionBy(col("__b")).orderBy(col(idCol))) - col("n_tokens"))
    val offsets = base.groupBy(col("__b")).agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__off",
        coalesce(
          sum(col("__bt")).over(Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__b"), col("__off"))
    inBucket.join(broadcast(offsets), Seq("__b"))
      .withColumn("shard", expr(s"(__cum_in + __off) div ${budgetTokens}L"))
      .select(col(idCol), col("n_tokens"), col("shard"))
  }

  /** Materialize a [[shardPlan]]: join the plan back to the full rows
    * and write one parquet file per shard directory (`repartition` on
    * the partition column — the small-file guard every partitioned
    * store write uses). The written layout IS the dataloader contract:
    * `shard=N/` directories of ~budget tokens each, ready for
    * round-robin assignment to workers.
    */
  def writeShards(
      df: DataFrame,
      plan: DataFrame,
      idCol: String,
      path: String): Unit = {
    df.join(plan.select(col(idCol), col("shard")), Seq(idCol))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
