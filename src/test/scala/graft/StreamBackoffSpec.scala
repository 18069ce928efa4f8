package graft

import graft.operators.BackoffLm

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The inline (task-closure model) stupid-backoff score is a stateless
  * projection, so it gates an unaggregated document stream with no
  * watermark and no state — and must equal the distributed join-based
  * batch operator doc-for-doc, bit-for-bit, including which back-off
  * order each position scored at.
  */
class StreamBackoffSpec extends SparkSpec {
  import spark.implicits._

  private val trainDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick red fox runs past the sleepy cat"),
    (3L, "a very different sentence with other words entirely"))
  private val scoreDocs = Seq(
    (10L, "the quick brown fox"),      // all-known trigrams
    (11L, "completely unseen tokens"), // double back-off everywhere
    (12L, "single"),                   // unigram only
    (13L, "the quick sleepy dog runs entirely past a fox"))

  private type R = (Long, Long, Long, Long, Long, Option[Double])

  test("inline score equals the join-based batch operator bit-for-bit") {
    val model = BackoffLm.train(trainDocs.toDF("doc_id", "text"), "doc_id", "text")
    try {
      val collected = BackoffLm.collectModel(model)
      val inline = BackoffLm
        .scoreInline(scoreDocs.toDF("doc_id", "text"), collected, "doc_id", "text")
        .as[R].collect().sortBy(_._1).toSeq
      val joined = BackoffLm
        .score(scoreDocs.toDF("doc_id", "text"), model, "doc_id", "text")
        .as[R].collect().sortBy(_._1).toSeq
      assert(inline == joined)
      assert(inline.size == 4)
      // the order mix is meaningful: doc 10 rides trigrams, doc 11 unigrams
      val byId = inline.map(r => r._1 -> r).toMap
      assert(byId(10L)._3 == 2L && byId(10L)._4 == 1L && byId(10L)._5 == 1L)
      assert(byId(11L)._3 == 0L && byId(11L)._4 == 0L && byId(11L)._5 == 3L)
    } finally model.unpersist()
  }

  test("stream scoring equals batch row-for-row; no state, append mode") {
    implicit val sqlCtx = spark.sqlContext
    val model = BackoffLm.train(trainDocs.toDF("doc_id", "text"), "doc_id", "text")
    try {
      val collected = BackoffLm.collectModel(model)
      val in = MemoryStream[(Long, String)]
      val scored = BackoffLm.scoreInline(in.toDF().toDF("doc_id", "text"), collected, "doc_id", "text")
      val name = s"sbo_${System.nanoTime()}"
      val q = scored.writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        in.addData(scoreDocs: _*)
        q.processAllAvailable()
        val stream = spark.table(name).as[R].collect().sortBy(_._1).toSeq
        val batch = BackoffLm
          .scoreInline(scoreDocs.toDF("doc_id", "text"), collected, "doc_id", "text")
          .as[R].collect().sortBy(_._1).toSeq
        assert(stream == batch)
        assert(stream.size == 4)
      } finally q.stop()
    } finally model.unpersist()
  }

  test("collectModel refuses an over-budget model") {
    val model = BackoffLm.train(trainDocs.toDF("doc_id", "text"), "doc_id", "text")
    try {
      val e = intercept[IllegalArgumentException](BackoffLm.collectModel(model, maxRows = 3))
      assert(e.getMessage.contains("gram rows"))
    } finally model.unpersist()
  }
}
