package graft

import graft.functions.HistogramSketch
import graft.streaming.WindowedAggs

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Windowed KS drift vs a static reference histogram: the stream path
  * (windowed histogram aggregate -> bucket-ECDF supremum) must equal
  * the batch computation bit for bit — the fold is integer arithmetic
  * over deterministic counters, so any divergence is a bug.
  */
class StreamKsSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000400000L
  private def ts(min: Int) = new Timestamp(base + min * 60000L)

  // reference: uniform-ish mass across [0, 100)
  private val ref = Seq(0L, 2L, 2L, 2L, 2L, 2L, 0L) // under, 5 buckets, over

  test("stream windowed KS equals batch; shifted window drifts, matched window doesn't") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val name = s"sks_${System.nanoTime()}"
    val events = Seq(
      // window 1: spread like the reference -> low KS
      (ts(0), 10.0), (ts(1), 30.0), (ts(2), 50.0), (ts(3), 70.0), (ts(4), 90.0),
      // window 2: all mass in the lowest bucket -> high KS
      (ts(6), 1.0), (ts(7), 2.0), (ts(8), 3.0))
    val q = WindowedAggs.histogramKs(
      WindowedAggs.windowedHistogram(in.toDF().toDF("ts", "v"), "ts", "v",
        windowDuration = "5 minutes", watermark = "10 minutes",
        numBuckets = 5, lo = 0.0, hi = 100.0),
      ref)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData((ts(60), 0.0))
      q.processAllAvailable()
      val stream = spark.table(name)
        .filter(col("window_start") < new Timestamp(base + 3000000L))
        .select(col("window_start"), col("n_window"), col("d_num"), col("ks_micro"))
        .as[(Timestamp, Long, Long, Long)].collect().sortBy(_._1.getTime).toSeq
      val batch = WindowedAggs.histogramKs(
        events.toDF("ts", "v")
          .groupBy(window(col("ts"), "5 minutes"))
          .agg(HistogramSketch.sketch(col("v"), 5, 0.0, 100.0).as("counters"))
          .select(col("window.start").as("window_start"), col("counters")),
        ref)
        .select(col("window_start"), col("n_window"), col("d_num"), col("ks_micro"))
        .as[(Timestamp, Long, Long, Long)].collect().sortBy(_._1.getTime).toSeq
      assert(stream == batch, s"stream $stream != batch $batch")
      assert(stream.size == 2)
      val (w1, w2) = (stream(0), stream(1))
      // matched window: per-bucket ECDFs track -> small supremum
      assert(w1._4 <= 200000L, s"matched window drifted: $w1")
      // collapsed window: all mass in bucket 1 vs 1/5 reference -> KS 0.8
      assert(w2._4 == 800000L, s"collapsed window: $w2")
    } finally q.stop()
  }
}
