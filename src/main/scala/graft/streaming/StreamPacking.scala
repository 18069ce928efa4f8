package graft.streaming

import graft.operators.Packing

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sequence packing on a LIVE stream — assign (shard, pack_id,
  * pack_offset) as documents arrive, so the training-shard layout is
  * produced by the ingest pipeline itself instead of a nightly batch
  * over the accumulated corpus.
  *
  * Same chunk scheme as the batch operator ([[Packing.packChunks]]):
  * documents are laid head-to-tail per shard and cut at fixed token
  * budgets. The streaming difference is ORDER — a stream packs in
  * arrival order (hash-then-id within each micro-batch, the batch
  * operator's order, applied per batch), because a global hash order
  * over an unbounded stream does not exist. Offsets continue across
  * micro-batches: the per-shard state is ONE long (the next write
  * offset), so state size is `shards`, not corpus — bounded forever,
  * no watermark needed.
  */
object StreamPacking {

  /** Internal row shape of the state operator (public: encoder codegen
    * needs constructor access).
    */
  final case class Doc(id: Long, shard: Long, n_tokens: Long, h: Long)

  final case class PackedDoc(
      id: Long, shard: Long, n_tokens: Long, pack_offset: Long, pack_id: Long)

  /** @param tokenCol token count column (e.g.
    *                 `TextFunctions.tokenCount(col("text"))`)
    * @param orderHash within-batch order; defaults to `xxhash64(id)` to
    *                  mirror [[Packing.packChunks]]
    */
  def packChunks(
      stream: DataFrame,
      idCol: String,
      tokenCol: Column,
      budgetTokens: Long,
      shards: Int,
      orderHash: Option[Column] = None): Dataset[PackedDoc] = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(shards > 0, "shards must be positive")
    implicit val docEnc = Encoders.product[Doc]
    implicit val outEnc = Encoders.product[PackedDoc]
    implicit val stateEnc = Encoders.scalaLong
    val h = orderHash.getOrElse(xxhash64(col(idCol)))
    stream
      .select(
        col(idCol).cast("long").as("id"),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        tokenCol.cast("long").as("n_tokens"),
        h.as("h"))
      .as[Doc]
      .groupByKey(_.shard)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Long, batch: Iterator[Doc], state: GroupState[Long]) => {
          var offset = state.getOption.getOrElse(0L)
          val out = batch.toSeq.sortBy(d => (d.h, d.id)).map { d =>
            val at = offset
            offset += d.n_tokens
            PackedDoc(d.id, shard, d.n_tokens, at, at / budgetTokens)
          }
          state.update(offset)
          out.iterator
        })
  }
}
