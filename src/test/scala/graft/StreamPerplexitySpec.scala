package graft

import graft.operators.NgramLm

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The inline (task-closure model) perplexity score is a stateless
  * projection, so it gates an unaggregated document stream with no
  * watermark and no state — and must equal the distributed join-based
  * batch operator doc-for-doc, bit-for-bit.
  */
class StreamPerplexitySpec extends SparkSpec {
  import spark.implicits._

  private val trainDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick red fox runs past the sleepy cat"),
    (3L, "a very different sentence with other words entirely"))
  private val scoreDocs = Seq(
    (10L, "the quick brown fox"),      // known bigrams
    (11L, "completely unseen tokens"), // unknown everything
    (12L, "single"),                   // no bigram -> (0, null, null)
    (13L, "the quick sleepy dog runs entirely past a fox"))

  test("inline score equals the join-based batch operator bit-for-bit") {
    val model = NgramLm.train(trainDocs.toDF("doc_id", "text"), "doc_id", "text")
    val collected = NgramLm.collectModel(model)
    val inline = NgramLm
      .perplexityInline(scoreDocs.toDF("doc_id", "text"), collected, "doc_id", "text")
      .as[(Long, Long, Option[Double], Option[Double])].collect().sortBy(_._1).toSeq
    val joined = NgramLm
      .perplexity(scoreDocs.toDF("doc_id", "text"), model, "doc_id", "text")
      .as[(Long, Long, Option[Double], Option[Double])].collect().sortBy(_._1).toSeq
    assert(inline == joined)
    assert(inline.size == 4 && inline.exists(_._3.isEmpty))
    model.unpersist()
  }

  test("stream scoring equals batch row-for-row; no state, append mode") {
    implicit val sqlCtx = spark.sqlContext
    val model = NgramLm.train(trainDocs.toDF("doc_id", "text"), "doc_id", "text")
    val collected = NgramLm.collectModel(model)
    val in = MemoryStream[(Long, String)]
    val scored = NgramLm.perplexityInline(in.toDF().toDF("doc_id", "text"), collected, "doc_id", "text")
    val name = s"spx_${System.nanoTime()}"
    val q = scored.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(scoreDocs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .as[(Long, Long, Option[Double], Option[Double])].collect().sortBy(_._1).toSeq
      val batch = NgramLm
        .perplexityInline(scoreDocs.toDF("doc_id", "text"), collected, "doc_id", "text")
        .as[(Long, Long, Option[Double], Option[Double])].collect().sortBy(_._1).toSeq
      assert(stream == batch)
      assert(stream.size == 4)
    } finally q.stop()
    model.unpersist()
  }

  test("collectModel refuses an over-budget model") {
    val model = NgramLm.train(trainDocs.toDF("doc_id", "text"), "doc_id", "text")
    val e = intercept[IllegalArgumentException](NgramLm.collectModel(model, maxRows = 3))
    assert(e.getMessage.contains("gram rows"))
    model.unpersist()
  }
}
