package graft

import graft.operators.CorpusDrift
import graft.streaming.StreamDrift
import graft.streaming.StreamDrift.DriftRow

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Streaming drift vs the batch operator: a closed window's movers and
  * scalar KL must equal CorpusDrift.topMovers/summary on the same docs
  * against the same reference, bit-for-bit.
  */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private val winMs = 60000L
  private def t(offMs: Long) = new Timestamp(1700000000000L / winMs * winMs + offMs)

  private val refDocs = Seq(
    (1L, "alpha alpha beta gamma"),
    (2L, "alpha beta beta delta"))
  private val windowDocs = Seq(
    (t(1000), "alpha surge surge"),
    (t(2000), "surge surge beta"),
    (t(3000), "gamma gamma"))

  test("closed window equals batch topMovers + summary against the same reference") {
    val reference = StreamDrift.collectReference(refDocs.toDF("doc_id", "text"), "text")
    assert(reference.total == 8L && reference.counts("alpha") == 3L)

    val stream = MemoryStream[(Timestamp, String)](
      Encoders.product[(Timestamp, String)], spark.sqlContext)
    val drift = StreamDrift.windowedTopMovers(
      stream.toDF().toDF("ts", "text"), "ts", "text", reference,
      windowMs = winMs, watermark = "0 seconds", k = 3)
    val name = s"sdrift_${System.nanoTime()}"
    val q = drift.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      stream.addData(windowDocs: _*)
      q.processAllAvailable()
      // advance the watermark two windows ahead so the window times out
      stream.addData((t(2 * winMs + 1000), "filler"))
      q.processAllAvailable()

      val got = spark.table(name).as[DriftRow].collect()
        .filter(_.window_start.getTime == t(0).getTime)
        .sortBy(r => (-math.abs(math.round(r.kl_contrib * 1e6)), r.token)).toSeq
      assert(got.size == 3, s"expected 3 movers, got: $got")

      val batchMovers = CorpusDrift.topMovers(
          windowDocs.map { case (_, txt) => (0L, txt) }.toDF("doc_id", "text"),
          refDocs.toDF("doc_id", "text"), "text", k = 3)
        .collect()
        .map(r => (r.getAs[String]("token"), r.getAs[Long]("c_a"),
          r.getAs[Long]("c_b"), r.getAs[Double]("kl_contrib"))).toSeq
      assert(got.map(r => (r.token, r.c_w, r.c_ref, r.kl_contrib)) == batchMovers)

      val batchKl = CorpusDrift.summary(
          windowDocs.map { case (_, txt) => (0L, txt) }.toDF("doc_id", "text"),
          refDocs.toDF("doc_id", "text"), "text")
        .collect().head.getAs[Double]("kl_ab")
      assert(got.forall(_.kl_window == batchKl),
        s"kl_window ${got.map(_.kl_window)} != batch $batchKl")
    } finally q.stop()
  }

  test("collectReference refuses an over-budget vocabulary") {
    val e = intercept[IllegalArgumentException](
      StreamDrift.collectReference(refDocs.toDF("doc_id", "text"), "text", maxRows = 2))
    assert(e.getMessage.contains("distinct tokens"))
  }
}
