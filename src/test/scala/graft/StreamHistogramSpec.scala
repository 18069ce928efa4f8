package graft

import graft.functions.HistogramSketch
import graft.streaming.WindowedAggs

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The histogram aggregate composed with an event-time window: stream
  * counters must equal the batch groupBy-window counters vector for
  * vector, and the in-plan quantile reads agree — the deterministic
  * sketch contract (pure sums, vector-add merge) makes the twin exact.
  */
class StreamHistogramSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000400000L
  private def ts(min: Int) = new Timestamp(base + min * 60000L)

  private val events = Seq(
    (ts(0), 12.0), (ts(1), 47.0), (ts(2), 12.5), (ts(3), 88.0),
    (ts(6), 5.0), (ts(7), 95.0), (ts(8), 55.0))
  private val sentinel = (ts(60), 0.0)

  test("stream windowed histogram equals batch counter-for-counter; quantiles agree") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val name = s"shist_${System.nanoTime()}"
    val q = WindowedAggs
      .windowedHistogram(in.toDF().toDF("ts", "v"), "ts", "v",
        windowDuration = "5 minutes", watermark = "10 minutes",
        numBuckets = 10, lo = 0.0, hi = 100.0)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(sentinel)
      q.processAllAvailable()
      val stream = spark.table(name)
        .filter(col("window_start") < new Timestamp(base + 3000000L))
        .select(col("window_start"), col("counters"), col("p50"), col("p95"))
        .as[(Timestamp, Seq[Long], Double, Double)].collect().sortBy(_._1.getTime).toSeq
      val batch = events.toDF("ts", "v")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(HistogramSketch.sketch(col("v"), 10, 0.0, 100.0).as("counters"))
        .select(
          col("window.start").as("window_start"),
          col("counters"),
          HistogramSketch.quantile(col("counters"), 0.5, 10, 0.0, 100.0).as("p50"),
          HistogramSketch.quantile(col("counters"), 0.95, 10, 0.0, 100.0).as("p95"))
        .as[(Timestamp, Seq[Long], Double, Double)].collect().sortBy(_._1.getTime).toSeq
      assert(stream == batch)
      assert(stream.size == 2)
      // window 1 holds 12, 12.5, 47, 88 -> median read = bucket [10,20) midpoint
      assert(stream.head._3 == 15.0)
    } finally q.stop()
  }
}
