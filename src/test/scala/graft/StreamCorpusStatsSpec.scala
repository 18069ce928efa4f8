package graft

import graft.functions.TextFunctions
import graft.streaming.StreamCorpusStats

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The streaming per-language corpus report must reproduce the batch
  * report's numbers: a single closed window over the same rows equals
  * the batch formula (exact percentiles), and late windows close
  * independently per language.
  */
class StreamCorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000400000L + min * 60000L)

  private val docs = Seq(
    (ts(0), "en", "the quick brown fox"),
    (ts(1), "en", "jumps over the lazy dog by the river"),
    (ts(2), "en", "a b"),
    (ts(1), "de", "der schnelle braune fuchs"),
    (ts(3), "de", "springt"))

  private def batchReport = docs.toDF("t", "lang", "text")
    .select(col("lang"), TextFunctions.tokenCount(col("text")).as("toks"),
      length(col("text")).cast("long").as("n_chars"))
    .groupBy(col("lang"))
    .agg(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("total_tokens"),
      round(percentile(col("toks"), lit(0.5)), 4).as("med_tokens"),
      round(percentile(col("toks"), lit(0.95)), 4).as("p95_tokens"),
      round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"))
    .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

  test("single closed window matches the batch formula exactly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val report = StreamCorpusStats.windowedReport(
      in.toDF().toDF("t", "lang", "text"),
      "t", "lang", "text", "10 minutes", "5 minutes", exactPercentiles = true)
    val name = s"scs_${System.nanoTime()}"
    val q = report.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      in.addData((ts(60), "en", "watermark push")) // close the first window
      q.processAllAvailable()
      val rows = spark.table(name)
        .filter(col("window_start") === ts(0))
        .collect().map(r => r.getString(2) -> r.toSeq.drop(3)).toMap
      assert(rows.keySet == Set("en", "de"))
      for (lang <- rows.keySet)
        assert(rows(lang) == batchReport(lang), s"$lang diverged from batch")
    } finally q.stop()
  }

  test("windows emit per language and window, append-only") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val report = StreamCorpusStats.windowedReport(
      in.toDF().toDF("t", "lang", "text"),
      "t", "lang", "text", "5 minutes", "1 minute")
    val name = s"scs2_${System.nanoTime()}"
    val q = report.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData((ts(0), "en", "a b c"), (ts(6), "de", "x y"))
      q.processAllAvailable()
      in.addData((ts(30), "en", "closer"))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("lang", "n_docs", "total_tokens")
        .as[(String, Long, Long)].collect().toSet
      assert(rows.contains(("en", 1L, 3L)), s"en window missing: $rows")
      assert(rows.contains(("de", 1L, 2L)), s"de window missing: $rows")
    } finally q.stop()
  }
}
