package graft

import graft.operators.Decontamination

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The closure-shipped bloom probe is a stateless projection, so it
  * serves an unaggregated stream in append mode — and for the same
  * eval set its flags must cover exactly what the exact batch operator
  * flags (no false negatives), with any extras being bloom false
  * positives only.
  */
class StreamBloomDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "zeta eta theta iota kappa"),
    (3L, "alpha beta gamma delta other words here"),
    (4L, "totally clean document nothing shared at all"))

  test("stream bloom probe covers batch-exact contamination flags") {
    implicit val sqlCtx = spark.sqlContext
    val evalSet = Seq(Tuple1("alpha beta gamma delta")).toDF("text")
    val in = MemoryStream[(Long, String)]
    val name = s"sbloom_${System.nanoTime()}"
    val q = Decontamination
      .flagContaminatedBloomStream(
        in.toDF().toDF("doc_id", "text"), evalSet, "doc_id", "text", n = 4)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val exact = Decontamination
        .flagContaminated(docs.toDF("doc_id", "text"), evalSet, "doc_id", "text", n = 4)
        .select(col("id"), col("eval_hits"), col("contaminated"))
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(stream.map(_._1) == exact.map(_._1))
      stream.zip(exact).foreach { case ((_, _, bloomHits, bloomFlag), (_, evalHits, flag)) =>
        assert(bloomHits >= evalHits) // never a false negative
        if (flag) assert(bloomFlag)
      }
      // and the batch bloom operator agrees with the stream probe
      val batchBloom = Decontamination
        .flagContaminatedBloom(docs.toDF("doc_id", "text"), evalSet, "doc_id", "text", n = 4)
        .select(col("id"), col("bloom_hits"), col("bloom_contaminated"))
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(stream.map(r => (r._1, r._3, r._4)) == batchBloom)
    } finally q.stop()
  }
}
