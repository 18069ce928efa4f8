package graft

import graft.functions.HyperLogLog
import graft.streaming.WindowedAggs

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The HLL native aggregate composed with an event-time window:
  * per-window registers computed over a stream (bounded state — one
  * 1 KB register array per active window) must equal the batch
  * groupBy-window registers over the same events register-for-register.
  * The sketch's determinism contract (max-folds over a fixed seeded
  * hash, associative/commutative merge) is exactly what makes the twin
  * exact, not approximate.
  */
class StreamHllSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000400000L
  private def ts(min: Int) = new Timestamp(base + min * 60000L)

  // window 1 (minutes 0-5): users a,b,c with repeats; window 2 (5-10): b,d
  private val events = Seq(
    (ts(0), "user_a"), (ts(1), "user_b"), (ts(2), "user_a"), (ts(3), "user_c"),
    (ts(4), "user_a"), (ts(6), "user_b"), (ts(7), "user_d"), (ts(8), "user_b"))
  private val sentinel = (ts(60), "zzz")

  test("stream windowed HLL equals batch register-for-register") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val name = s"shll_${System.nanoTime()}"
    val q = WindowedAggs
      .windowedDistinct(in.toDF().toDF("ts", "user"), "ts", "user",
        windowDuration = "5 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(sentinel)
      q.processAllAvailable()

      val stream = spark.table(name)
        .select(col("window_start"), col("registers"), col("approx_distinct"))
        .as[(Timestamp, Seq[Int], Double)].collect().sortBy(_._1.getTime).toSeq
      val batch = events.toDF("ts", "user")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(HyperLogLog.sketch(col("user")).as("registers"))
        .select(
          col("window.start").as("window_start"),
          col("registers"),
          round(HyperLogLog.estimate(col("registers")), 6).as("approx_distinct"))
        .as[(Timestamp, Seq[Int], Double)].collect().sortBy(_._1.getTime).toSeq
      // the sentinel window appears in the stream output; compare the
      // event windows only
      val streamEventWindows = stream.filter(_._1.getTime < base + 3000000L)
      assert(streamEventWindows == batch)
      // tiny cardinalities sit in the linear-counting regime: exact
      val byWindow = streamEventWindows.map(r => r._1.getTime -> math.round(r._3)).toMap
      assert(byWindow.values.toSeq.sorted == Seq(2L, 3L))
    } finally q.stop()
  }
}
