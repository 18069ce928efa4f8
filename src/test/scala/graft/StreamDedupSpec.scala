package graft

import graft.streaming.StreamDedup

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Watermarked in-stream dedup: duplicates within the delay are
  * dropped across micro-batches; content-fingerprint dedup treats
  * case/whitespace variants as the same document.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000400000L + min * 60000L)

  test("byKeys drops cross-batch duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Timestamp, String)]
    val out = StreamDedup.byKeys(
      in.toDF.toDF("id", "event_time", "payload"), Seq("id"), "event_time", "10 minutes")
    val name = s"sdk_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData((1, ts(0), "a"), (2, ts(1), "b"), (1, ts(2), "a-dup-same-batch"))
      q.processAllAvailable()
      in.addData((1, ts(3), "a-dup-next-batch"), (3, ts(4), "c"))
      q.processAllAvailable()
      val ids = spark.table(name).select("id").as[Int].collect().sorted.toSeq
      assert(ids == Seq(1, 2, 3), s"got $ids")
    } finally q.stop()
  }

  test("byFingerprint treats case/whitespace variants as duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Timestamp, String)]
    val out = StreamDedup.byFingerprint(
      in.toDF.toDF("id", "event_time", "text"), "text", "event_time", "10 minutes")
    val name = s"sdf_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData((1, ts(0), "The quick Fox"), (2, ts(1), "another doc"))
      q.processAllAvailable()
      in.addData((3, ts(2), "the   quick fox"), (4, ts(3), "a third doc"))
      q.processAllAvailable()
      val ids = spark.table(name).select("id").as[Int].collect().sorted.toSeq
      assert(ids == Seq(1, 2, 4), s"fingerprint variant not deduped: $ids")
    } finally q.stop()
  }
}
