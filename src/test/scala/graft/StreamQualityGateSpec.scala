package graft

import graft.operators.QualityClassifier

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The quality classifier is a stateless projection, so it gates an
  * unaggregated document stream with no watermark and selects exactly
  * the rows the batch operator keeps on the same data — the in-flight
  * quality filter a training-data ingest runs before anything lands.
  */
class StreamQualityGateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "aaa bbb ccc"),
    (3L, "entirely different material with many more words to score"),
    (4L, ""))

  test("stream score+gate equals the batch operator row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val gated = QualityClassifier
      .score(in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val name = s"sqg_${System.nanoTime()}"
    val q = gated.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .select("id", "n_tokens", "feat_sum", "keep")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val batch = QualityClassifier
        .score(docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("id", "n_tokens", "feat_sum", "keep")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(stream == batch)
      assert(stream.size == 4)
    } finally q.stop()
  }

  test("trained-weight serving gates a stream identically to batch") {
    implicit val sqlCtx = spark.sqlContext
    val weights = Seq.tabulate(QualityClassifier.NumBuckets)(b => (b - 2048) / 2048.0)
    val in = MemoryStream[(Long, String)]
    val gated = QualityClassifier
      .scoreWithWeights(in.toDF().toDF("doc_id", "text"), "doc_id", "text", weights)
    val name = s"sqg2_${System.nanoTime()}"
    val q = gated.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .select("id", "w_sum", "keep").as[(Long, Double, Boolean)]
        .collect().sortBy(_._1).toSeq
      val batch = QualityClassifier
        .scoreWithWeights(docs.toDF("doc_id", "text"), "doc_id", "text", weights)
        .select("id", "w_sum", "keep").as[(Long, Double, Boolean)]
        .collect().sortBy(_._1).toSeq
      assert(stream == batch)
    } finally q.stop()
  }
}
