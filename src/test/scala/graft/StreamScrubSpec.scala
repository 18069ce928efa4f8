package graft

import graft.functions.{MultiPatternCount, NormalizeText}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The blocklist automaton and Unicode normalization are pure
  * projections — append-mode legal on unaggregated streams with no
  * state — and must emit exactly what the batch form emits for the
  * same rows.
  */
class StreamScrubSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "slow café fast table here"),
    (2L, "nothing flagged in this one"),
    (3L, "slow slow slow"))

  private def shape(df: org.apache.spark.sql.DataFrame) =
    df.select(
      col("doc_id"),
      NormalizeText.nfc(col("text")).as("norm"),
      MultiPatternCount(lower(col("text")), Seq("slow", "fast table")).getField("hits").as("hits"))

  test("stream blocklist + NFC projection equals batch row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val name = s"sscrub_${System.nanoTime()}"
    val q = shape(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      val batch = shape(docs.toDF("doc_id", "text"))
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(stream == batch)
      assert(stream.head._2 == "slow café fast table here") // composed
      assert(stream.map(_._3) == Seq(2L, 0L, 3L))
    } finally q.stop()
  }
}
