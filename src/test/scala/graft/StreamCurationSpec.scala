package graft

import graft.streaming.StreamCuration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming curation chain (quality gate → cross-batch exact
  * dedup → cumulative split counters in one foreachBatch pass) must
  * equal the batch chain over everything ingested, after any number
  * of micro-batches — including duplicates planted within a batch,
  * across batches, and documents the quality gate drops.
  */
class StreamCurationSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long): String =
    s"document number $i with some reasonable plain words about topic ${i % 7} " +
      s"and more varied material for the gopher gate item $i"

  // batch 1: clean docs + an in-batch duplicate pair (winner 10 < 99)
  private val b1: Seq[(Long, String)] =
    (10L to 20L).map(i => (i, doc(i))) :+ ((99L, doc(10)))
  // batch 2: a cross-batch duplicate of doc 11, gate-failing garbage,
  // and fresh docs
  private val b2: Seq[(Long, String)] =
    Seq((200L, doc(11)), (201L, "aaa aaa aaa aaa aaa aaa"), (202L, "")) ++
      (210L to 215L).map(i => (i, doc(i)))
  // batch 3: duplicates of both earlier batches plus fresh docs
  private val b3: Seq[(Long, String)] =
    Seq((300L, doc(10)), (301L, doc(214))) ++ (310L to 312L).map(i => (i, doc(i)))

  private def counters(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("foreachBatch curation over micro-batches == batch chain over the union") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("stream-curation")
    StreamCuration.init(spark, path)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamCuration.absorbBatch(batch.sparkSession, path, batch, "doc_id", "text")
      }
      .start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      // stream == batch after EVERY prefix, not just the end
      assert(counters(StreamCuration.loadCounters(spark, path)) ==
        counters(StreamCuration.batchChain(b1.toDF("doc_id", "text"), "doc_id", "text")))
      in.addData(b2: _*); q.processAllAvailable()
      assert(counters(StreamCuration.loadCounters(spark, path)) ==
        counters(StreamCuration.batchChain((b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")))
      in.addData(b3: _*); q.processAllAvailable()
      val streamed = counters(StreamCuration.loadCounters(spark, path))
      val batch = counters(
        StreamCuration.batchChain((b1 ++ b2 ++ b3).toDF("doc_id", "text"), "doc_id", "text"))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // the chain did real work: gate dropped rows, dedup dropped rows
      val total = streamed.values.map(_._1).sum
      assert(total == (b1 ++ b2 ++ b3).size - 2 /*gate*/ - 4 /*dups*/,
        s"survivor count wrong: $streamed")
    } finally q.stop()
  }

  test("duplicate-only and gate-only batches leave the counters unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("stream-curation-noop")
    StreamCuration.init(spark, path)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamCuration.absorbBatch(batch.sparkSession, path, batch, "doc_id", "text")
      }
      .start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      val before = counters(StreamCuration.loadCounters(spark, path))
      // every row is either a replay of batch 1 or gate-failing noise
      in.addData(Seq((500L, doc(10)), (501L, doc(20)), (502L, "zzz zzz zzz zzz")): _*)
      q.processAllAvailable()
      assert(counters(StreamCuration.loadCounters(spark, path)) == before)
    } finally q.stop()
  }
}
