package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessions close after the inactivity gap as the watermark advances") {
    val stream = MemoryStream[Event](Encoders.product[Event], spark.sqlContext)
    def t(m: Int) = new Timestamp(1700000000000L + m * 60000L)

    val sessions = Sessionize.byInactivityGap(
      stream.toDS().withWatermark("ts", "0 seconds"), gapMs = 5 * 60000L)
    val name = s"sessions_${System.nanoTime()}"
    val q = sessions.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // key 1: two bursts separated by > gap; key 2: one burst
      stream.addData(
        Event(1, t(0), 1.0), Event(1, t(2), 2.0), Event(1, t(4), 3.0),
        Event(2, t(1), 10.0))
      q.processAllAvailable()
      stream.addData(Event(1, t(20), 5.0), Event(2, t(21), 20.0))
      q.processAllAvailable()
      // push the watermark far ahead so every open session times out
      stream.addData(Event(99, t(120), 0.0))
      q.processAllAvailable()
      stream.addData(Event(99, t(240), 0.0))
      q.processAllAvailable()

      val got = spark.table(name).as[Session].collect()
        .map(s => (s.key, s.session_start.getTime, s.n_events, s.total_value)).toSet
      assert(got.contains((1L, t(0).getTime, 3L, 6.0)), s"first burst of key 1 missing: $got")
      assert(got.contains((1L, t(20).getTime, 1L, 5.0)), s"second burst of key 1 missing: $got")
      assert(got.contains((2L, t(1).getTime, 1L, 10.0)))
      assert(got.contains((2L, t(21).getTime, 1L, 20.0)))
    } finally q.stop()
  }

  test("pathTrigrams: session gaps break paths; ties order by the tie column") {
    import org.apache.spark.sql.functions.col
    // user 1 session A: view click buy (one trigram); after a 1-hour
    // gap session B: view view (too short -> whole-session gram);
    // a tied timestamp orders by event_id (click before buy)
    val ev = Seq(
      (1L, 1L, 0L, "view"), (1L, 2L, 100L, "click"), (1L, 3L, 100L, "buy"),
      (1L, 4L, 7300L, "view"), (1L, 5L, 7310L, "view"),
      (2L, 6L, 0L, "view"), (2L, 7L, 10L, "click"), (2L, 8L, 20L, "buy"))
      .toDF("user_id", "event_id", "t", "event_type")
    val got = graft.operators.Sessionization
      .pathTrigrams(ev, Seq("user_id"), col("t"), col("event_id"),
        col("event_type"), gapSeconds = 1800L, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("view click buy", 2L), ("view view", 1L)), s"got $got")
  }
}
