package graft

import graft.operators.Decontamination

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming decontamination: the eval-gram probe is a stateless
  * per-row projection, so it flags in-stream exactly what the batch
  * operator flags for the same eval set.
  */
class StreamDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta unrelated tail words here"),
    (3L, "completely different content about catalyst optimizer internals"),
    (4L, "short doc"),
    (5L, "beta gamma delta epsilon shifted by one position"))
    .toDF("doc_id", "text")

  private lazy val evalSet = Seq(
    "alpha beta gamma delta epsilon",
    "totally disjoint benchmark question text")
    .toDF("text")

  test("stream flags exactly what the batch operator flags") {
    val batch = Decontamination
      .flagContaminated(corpus, evalSet, "doc_id", "text", n = 4)
      .select("id", "n_grams", "eval_hits", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = Decontamination.flagContaminatedStream(
      in.toDF.toDF("doc_id", "text"), evalSet, "doc_id", "text", n = 4)
    val name = s"sdc_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val rows = corpus.as[(Long, String)].collect()
      in.addData(rows.take(3))
      q.processAllAvailable()
      in.addData(rows.drop(3))
      q.processAllAvailable()
      val streamed = spark.table(name)
        .select("id", "n_grams", "eval_hits", "contaminated")
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
