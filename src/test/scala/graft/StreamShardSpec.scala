package graft

import graft.operators.Packing
import graft.streaming.StreamShard

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamShard.shardPlan]] — the streaming twin of the
  * token-balanced shard planner. Contract: a single-batch stream
  * equals [[Packing.shardPlan]] row for row; across micro-batches the
  * carried token offset makes the next batch continue filling the
  * tail shard the previous batch left underfull.
  */
class StreamShardSpec extends SparkSpec {
  import spark.implicits._

  // (id, n_tokens); budget 100, 8 order buckets
  private val docs = (0L until 60L).map(i => (i, 7L + (i * 3) % 11))
  private val budget = 100L
  private val buckets = 8

  private def run(batches: Seq[Seq[(Long, Long)]]): Map[Long, (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val out = StreamShard.shardPlan(
      in.toDF.toDF("id", "toks"), "id", col("toks"),
      budgetTokens = budget, orderBuckets = buckets)
    val name = s"ssh_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name)
        .select("id", "n_tokens", "shard")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    } finally q.stop()
  }

  private def canonical(batch: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val bucketOf = spark.createDataset(batch).toDF("id", "toks")
      .select(col("id"), pmod(xxhash64(col("id")), lit(buckets.toLong)).as("b"))
      .as[(Long, Long)].collect().toMap
    batch.sortBy { case (id, _) => (bucketOf(id), id) }
  }

  test("single-batch stream equals the batch shard planner row for row") {
    val streamed = run(Seq(docs))
    val batch = Packing
      .shardPlan(docs.toDF("id", "toks"), "id", col("toks"),
        budgetTokens = budget, orderBuckets = buckets)
      .select("id", "n_tokens", "shard")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed == batch)
  }

  test("the carried offset makes later batches continue the tail shard") {
    val (b1, b2) = docs.splitAt(35)
    val streamed = run(Seq(b1, b2))
    // exact replay: running offset over batch-1 canonical order, then
    // batch-2 canonical order
    var offset = 0L
    val expected = (canonical(b1) ++ canonical(b2)).map { case (id, t) =>
      val at = offset; offset += t
      id -> (t, at / budget)
    }.toMap
    assert(streamed == expected)
    // the boundary doc of batch 2 lands in batch 1's underfull tail
    // shard unless batch 1 ended exactly on the budget line
    val b1Tokens = b1.map(_._2).sum
    val tailShard = streamed(canonical(b1).last._1)._2
    val firstB2Shard = streamed(canonical(b2).head._1)._2
    if (b1Tokens % budget != 0) assert(firstB2Shard == b1Tokens / budget)
    assert(firstB2Shard >= tailShard)
    // every shard except the last carries budget +- (maxDoc - 1)
    val totals = streamed.values.groupBy(_._2).view.mapValues(_.map(_._1).sum).toMap
    val last = totals.keys.max
    val maxDoc = docs.map(_._2).max
    totals.foreach { case (s, t) =>
      if (s != last) assert(math.abs(t - budget) < maxDoc, s"shard $s total $t off budget")
    }
  }
}
