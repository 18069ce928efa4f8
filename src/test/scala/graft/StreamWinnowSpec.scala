package graft

import graft.operators.Winnow

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[Winnow.fingerprints]] — the DataFrame-level API, not just the
  * column form — must be legal as a readStream transform: the
  * spread-to-cores batch optimization it routes through is a no-op on
  * streaming input (no `.rdd` call), and the exploded (id, fp)
  * inverted-index rows match the batch run exactly on the same data.
  */
class StreamWinnowSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the sleepy cat again and again"),
    (3L, "completely unrelated text about spark structured streaming"))

  test("Winnow.fingerprints runs on a streaming DataFrame and equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val name = s"swinfp_${System.nanoTime()}"
    val q = Winnow
      .fingerprints(in.toDF().toDF("doc_id", "text"), "doc_id", "text", k = 6, w = 5)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .as[(Long, Long)].collect().sorted.toSeq
      val batch = Winnow
        .fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k = 6, w = 5)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(stream == batch)
      assert(stream.nonEmpty)
      // shared prefix between docs 1 and 2 must surface a shared fingerprint
      val byDoc = stream.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    } finally q.stop()
  }

  test("batch path still spreads a single-partition input across cores") {
    val one = docs.toDF("doc_id", "text").coalesce(1)
    val out = Winnow.fingerprints(one, "doc_id", "text", k = 6, w = 5)
    assert(out.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
  }
}
