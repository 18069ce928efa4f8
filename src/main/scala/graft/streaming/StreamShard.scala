package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Token-balanced shard assignment on a LIVE stream — the streaming
  * twin of [[graft.operators.Packing.shardPlan]]: documents are cut
  * into shards of ~`budgetTokens` each AS THEY ARRIVE, with the global
  * running token total carried across micro-batches, so the tail shard
  * a batch leaves underfull is exactly the shard the next batch
  * continues filling. The produced `shard` column is the same
  * dataloader contract the batch planner emits (`writeShards` layout).
  *
  * Within each micro-batch documents are laid out in the batch
  * operator's canonical (orderBucket, id) order, so a single-batch
  * stream reproduces [[graft.operators.Packing.shardPlan]] EXACTLY
  * (StreamShardSpec's differential); across batches the order is
  * arrival order, the only order an unbounded stream has (the
  * [[StreamPacking]] argument).
  *
  * State is ONE long — the running token total — bounded forever, no
  * watermark needed. The prefix sum is inherently sequential, so each
  * micro-batch serializes through the single state group: the right
  * cost for increment-sized batches (the streaming contract); a
  * backfill-sized batch belongs to the BATCH planner, whose two-level
  * bucketed windows compute the same prefix 256-way parallel.
  */
object StreamShard {

  /** Internal row shapes (public: encoder codegen needs constructor
    * access).
    */
  final case class Doc(id: Long, n_tokens: Long, b: Long)

  final case class ShardedDoc(id: Long, n_tokens: Long, shard: Long)

  /** @param tokenCol token count column (e.g.
    *                 `TextFunctions.tokenCount(col("text"))`)
    * @param bucketOf deterministic order bucket in [0, orderBuckets);
    *                 defaults to `pmod(xxhash64(id), orderBuckets)` —
    *                 the batch planner's default, so the differential
    *                 holds parameter for parameter
    */
  def shardPlan(
      stream: DataFrame,
      idCol: String,
      tokenCol: Column,
      budgetTokens: Long,
      orderBuckets: Int = 256,
      bucketOf: Option[Column] = None): Dataset[ShardedDoc] = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(orderBuckets > 0, "orderBuckets must be positive")
    implicit val docEnc = Encoders.product[Doc]
    implicit val outEnc = Encoders.product[ShardedDoc]
    implicit val stateEnc = Encoders.scalaLong
    val b = bucketOf.getOrElse(pmod(xxhash64(col(idCol)), lit(orderBuckets.toLong)))
    stream
      .select(
        col(idCol).cast("long").as("id"),
        tokenCol.cast("long").as("n_tokens"),
        b.cast("long").as("b"))
      .as[Doc]
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Int, batch: Iterator[Doc], state: GroupState[Long]) => {
          var offset = state.getOption.getOrElse(0L)
          val out = batch.toSeq.sortBy(d => (d.b, d.id)).map { d =>
            val at = offset
            offset += d.n_tokens
            ShardedDoc(d.id, d.n_tokens, at / budgetTokens)
          }
          state.update(offset)
          out.iterator
        })
  }
}
