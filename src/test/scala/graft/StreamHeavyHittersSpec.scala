package graft

import graft.functions.{CountMinSketch => CM}
import graft.streaming.WindowedAggs

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The count-min native aggregate composed with an event-time window:
  * per-window sketches computed over a stream (bounded state — one
  * fixed counter matrix per active window) must equal the batch
  * groupBy-window sketch over the same events counter-for-counter,
  * and the heavy-hitter probe over both must agree. The sketch's
  * determinism contract (pure sums over fixed seeded hashes,
  * associative merges) is exactly what makes the twin exact, not
  * approximate.
  */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000400000L
  private def ts(min: Int) = new Timestamp(base + min * 60000L)

  // window 1 (minutes 0-5): "alpha" x3, "beta" x1; window 2 (5-10): "beta" x2
  private val events = Seq(
    (ts(0), "alpha"), (ts(1), "alpha"), (ts(2), "beta"), (ts(3), "alpha"),
    (ts(6), "beta"), (ts(7), "beta"))
  // late sentinel far past the watermark so append mode finalizes all windows
  private val sentinel = (ts(60), "zzz")

  private val depth = 4
  private val width = 64

  test("stream windowed sketch equals batch counter-for-counter; heavy hitters agree") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val name = s"shh_${System.nanoTime()}"
    val q = WindowedAggs
      .windowedSketch(in.toDF().toDF("ts", "term"), "ts", "term",
        windowDuration = "5 minutes", watermark = "10 minutes",
        depth = depth, width = width)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(sentinel)
      q.processAllAvailable()

      val stream = spark.table(name)
        .select(col("window_start"), col("sketch"))
        .as[(Timestamp, Seq[Long])].collect().sortBy(_._1.getTime).toSeq
      val batchSketches = events.toDF("ts", "term")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(CM.sketch(col("term"), depth, width).as("sketch"))
        .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
          col("sketch"))
      val batch = batchSketches
        .select(col("window_start"), col("sketch"))
        .as[(Timestamp, Seq[Long])].collect().sortBy(_._1.getTime).toSeq

      assert(stream.map(_._1) == batch.map(_._1), "finalized windows differ")
      assert(stream == batch, "sketch counters differ between stream and batch")
      assert(stream.size == 2)
      // every sketch row's counters sum to the window's event count
      assert(stream.head._2.sum == depth.toLong * 4)
      assert(stream(1)._2.sum == depth.toLong * 2)

      // heavy-hitter probe over the streamed sketches == over the batch twin
      val candidates = Seq(
        (ts(0), "alpha"), (ts(0), "beta"), (ts(5), "alpha"), (ts(5), "beta"))
        .toDF("window_start", "term")
      def hh(sk: org.apache.spark.sql.DataFrame) = WindowedAggs
        .heavyHitters(sk, candidates, "term", threshold = 2L, depth = depth, width = width)
        .select(col("window_start"), col("term"), col("est"))
        .as[(Timestamp, String, Long)].collect().map(t => (t._1.getTime, t._2, t._3)).toSet
      val streamHh = hh(spark.table(name))
      assert(streamHh == hh(batchSketches))
      // never-underestimate: alpha(3) in w1 and beta(2) in w2 must clear 2
      assert(streamHh.exists(t => t._1 == base && t._2 == "alpha" && t._3 >= 3))
      assert(streamHh.exists(t => t._1 == base + 300000L && t._2 == "beta" && t._3 >= 2))
      assert(!streamHh.exists(t => t._1 == base + 300000L && t._2 == "alpha"))
    } finally q.stop()
  }
}
