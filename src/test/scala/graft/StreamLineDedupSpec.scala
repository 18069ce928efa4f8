package graft

import graft.operators.LineDedup

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stateless serving half of line-level dedup: a batch-derived
  * frequent-line list scrubbing a stream must equal the full batch
  * [[LineDedup.removeFrequentLines]] over the same corpus — and the
  * scrub is a pure projection (no state store, no aggregation), so
  * append mode just works.
  */
class StreamLineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "HEADER\nalpha beta\nFOOTER"),
    (2L, "HEADER\ngamma delta\nFOOTER"),
    (3L, "HEADER\nepsilon\nHEADER\nFOOTER"),
    (4L, "HEADER\nFOOTER"),
    (5L, "unique only"))

  test("stream scrub with a batch-derived list == batch removeFrequentLines") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = docs.toDF("doc_id", "text")
    val lines = LineDedup.frequentLines(corpus, minDocs = 3L)
    assert(lines.toSet == Set("HEADER", "FOOTER"))

    val in = MemoryStream[(Long, String)]
    val name = s"slds_${System.nanoTime()}"
    val q = LineDedup.scrub(in.toDF().toDF("doc_id", "text"), lines.toSeq)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
      val batch = LineDedup.removeFrequentLines(corpus, minDocs = 3L)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(stream == batch)
      assert(stream.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("frequentLines fails loud past the closure-shipping bound") {
    val many = spark.range(30)
      .select(lit(0L).as("doc_id"), concat(lit("l"), col("id")).as("text"))
      .union(spark.range(30)
        .select(lit(1L).as("doc_id"), concat(lit("l"), col("id")).as("text")))
    val e = intercept[IllegalArgumentException] {
      LineDedup.frequentLines(many, minDocs = 2L, maxLines = 10)
    }
    assert(e.getMessage.contains("frequent-line set exceeds"))
  }
}
