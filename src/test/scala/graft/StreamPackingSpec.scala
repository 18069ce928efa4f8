package graft

import graft.operators.Packing
import graft.streaming.StreamPacking

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamPackingSpec extends SparkSpec {
  import spark.implicits._

  // (id, n_tokens) documents; 2 shards (even/odd ids), budget 100
  private val docs = (0L until 40L).map(i => (i, 10L + (i % 7)))

  private def run(batches: Seq[Seq[(Long, Long)]]): Map[Long, (Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val out = StreamPacking.packChunks(
      in.toDF.toDF("id", "toks"), "id", col("toks"), budgetTokens = 100L, shards = 2)
    val name = s"spk_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name)
        .select("id", "shard", "pack_offset", "pack_id")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    } finally q.stop()
  }

  test("single-batch stream packs exactly like the batch operator") {
    val streamed = run(Seq(docs))
    val batch = Packing
      .packChunks(docs.toDF("id", "toks"), "id", col("toks"), budgetTokens = 100L, shards = 2)
      .select("id", "shard", "pack_offset", "pack_id")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(streamed == batch)
  }

  test("offsets continue across micro-batches; state is one counter per shard") {
    val (b1, b2) = docs.splitAt(25)
    val packed = run(Seq(b1, b2))
    assert(packed.size == docs.size)
    // per shard: offsets are gap-free and strictly increasing in pack order
    for (shard <- Seq(0L, 1L)) {
      val inShard = packed.collect { case (id, (s, off, _)) if s == shard => (id, off) }.toSeq
      val tokens = docs.toMap
      val sorted = inShard.sortBy(_._2)
      val expectedOffsets = sorted.scanLeft(0L) { case (acc, (id, _)) => acc + tokens(id) }
      assert(sorted.map(_._2) == expectedOffsets.init, s"shard $shard offsets have gaps")
    }
    // pack_id is offset / budget everywhere
    for ((_, (_, off, pid)) <- packed) assert(pid == off / 100L)
  }
}
