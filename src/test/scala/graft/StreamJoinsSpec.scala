package graft

import graft.streaming.StreamJoins

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Watermarked stream-stream temporal joins: point-in-interval
  * containment and as-of-within-horizon enrichment.
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000400000L + min * 60000L)

  test("pointInInterval matches events inside same-key intervals only") {
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Int, Timestamp, String)]
    val iv = MemoryStream[(Int, Timestamp, Timestamp, String)]
    val out = StreamJoins.pointInInterval(
      ev.toDF.toDF("k", "ts", "ev"),
      "ts",
      iv.toDF.toDF("k", "start_ts", "end_ts", "iv"),
      "start_ts", "end_ts",
      Seq("k"),
      eventDelay = "10 minutes", intervalDelay = "10 minutes",
      maxIntervalLength = "30 minutes")
    val name = s"pii_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      iv.addData((1, ts(0), ts(10), "win1"), (2, ts(0), ts(10), "win2"))
      ev.addData(
        (1, ts(5), "inside"), // in win1
        (1, ts(11), "after"), // outside every key-1 interval
        (2, ts(10), "boundary"), // end is inclusive
        (3, ts(5), "no-interval-key"))
      q.processAllAvailable()
      val got = spark.table(name).select("ev", "iv").as[(String, String)].collect().toSet
      assert(got == Set(("inside", "win1"), ("boundary", "win2")), s"got $got")
    } finally q.stop()
  }

  test("left-outer pointInInterval emits unmatched events after the watermark closes") {
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Int, Timestamp, String)]
    val iv = MemoryStream[(Int, Timestamp, Timestamp, String)]
    val out = StreamJoins.pointInInterval(
      ev.toDF.toDF("k", "ts", "ev"),
      "ts",
      iv.toDF.toDF("k", "start_ts", "end_ts", "iv"),
      "start_ts", "end_ts",
      Seq("k"),
      eventDelay = "5 minutes", intervalDelay = "5 minutes",
      maxIntervalLength = "30 minutes",
      joinType = "left_outer")
    val name = s"pio_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      iv.addData((1, ts(0), ts(10), "win1"))
      ev.addData((1, ts(5), "inside"), (2, ts(5), "orphan"))
      q.processAllAvailable()
      // push both watermarks far past the orphan's join window
      iv.addData((9, ts(500), ts(501), "late-win"))
      ev.addData((9, ts(500), "late-ev"))
      q.processAllAvailable()
      val got = spark.table(name).select("ev", "iv")
        .as[(String, Option[String])].collect().toMap
      assert(got("inside").contains("win1"))
      assert(got.contains("orphan") && got("orphan").isEmpty,
        s"unmatched event must surface with null interval: $got")
    } finally q.stop()
  }

  test("asOfCandidates + latest-per-key dedup = as-of within horizon") {
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Int, Timestamp, String)]
    val up = MemoryStream[(Int, Timestamp, String)]
    val out = StreamJoins.asOfCandidates(
      ev.toDF.toDF("k", "ts", "ev"),
      "ts",
      up.toDF.toDF("k", "uts", "dim"),
      "uts",
      Seq("k"),
      eventDelay = "10 minutes", updateDelay = "10 minutes",
      horizon = "15 minutes")
    val name = s"asc_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      up.addData((1, ts(0), "v0"), (1, ts(5), "v1"), (2, ts(0), "w0"))
      ev.addData(
        (1, ts(6), "e1"), // candidates v0 + v1; as-of winner v1
        (1, ts(4), "e2"), // candidate v0 only (v1 is later than the event)
        (2, ts(16), "e3"), // w0 is 16 min old: outside the 15-min horizon
        (1, ts(0), "e4")) // uts <= ts: v0 at exactly the event time matches
      q.processAllAvailable()
      val cands = spark.table(name)
      // raw candidate multiplicity: e1 matched both versions
      assert(cands.filter(col("ev") === "e1").count() == 2)
      assert(cands.filter(col("ev") === "e3").count() == 0, "horizon must exclude stale dims")
      // the documented downstream: latest-per-key dedup picks the as-of winner
      val winners = graft.operators.CdcDedup
        .latestPerKey(cands, Seq("ev"), versionCol = "uts")
        .select("ev", "dim").as[(String, String)].collect().toMap
      assert(winners == Map("e1" -> "v1", "e2" -> "v0", "e4" -> "v0"), s"got $winners")
    } finally q.stop()
  }
}
