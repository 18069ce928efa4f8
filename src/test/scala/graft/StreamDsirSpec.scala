package graft

import graft.operators.{Dsir, Winnow}
import graft.functions.{TextFunctions => TF}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** DSIR importance scoring is a stateless fold against a
  * closure-shipped bucket table, and winnowing fingerprints are
  * per-row array ops — both gate an unaggregated document stream
  * with no watermark and produce exactly the batch results on the
  * same data (the in-flight select-like-the-target / overlap-audit
  * steps of a streaming ingest).
  */
class StreamDsirSpec extends SparkSpec {
  import spark.implicits._

  private val reference = Seq(
    (100L, "curated encyclopedia article about science history", true),
    (101L, "buy cheap pills now click here buy now", false),
    (102L, "encyclopedia of natural science curated", true))

  private val docs = Seq(
    (1L, "curated science article"),
    (2L, "click here now"),
    (3L, "natural history of science"))

  test("stream DSIR scoring equals the batch operator row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val ratios = Dsir.bucketLogRatios(
      reference.toDF("id", "text", "t"), "text", col("t"), buckets = 64)
    val in = MemoryStream[(Long, String)]
    val scored = Dsir.scored(in.toDF().toDF("doc_id", "text"), "doc_id", "text", ratios)
    val name = s"sdsir_${System.nanoTime()}"
    val q = scored.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val batch = Dsir.scored(docs.toDF("doc_id", "text"), "doc_id", "text", ratios)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(stream == batch)
      assert(stream.size == 3)
    } finally q.stop()
  }

  test("stream winnow fingerprints equal the batch column form") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    def fps(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), TF.charShingles(col("text"), 5).as("__g"))
      .select(col("doc_id"), transform(col("__g"), g => Winnow.Xxhash64Hash(g)).as("__h"))
      .select(col("doc_id"),
        Winnow.fingerprintArrayFromHashes(col("__h"), 4).as("fps"))
    val name = s"swin_${System.nanoTime()}"
    val q = fps(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
      val batch = fps(docs.toDF("doc_id", "text"))
        .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
      assert(stream == batch)
      assert(stream.forall(_._2.nonEmpty))
    } finally q.stop()
  }
}
