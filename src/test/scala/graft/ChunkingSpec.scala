package graft

import graft.operators.Chunking

import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, n: Int) =
    (id, (0 until n).map(i => s"w$i").mkString(" "))

  test("short doc yields exactly one (possibly short) chunk") {
    val out = Chunking.chunk(
      Seq(doc(1L, 3)).toDF("doc_id", "text"), "doc_id", "text", 8, 4)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Int]("chunk_id") == 0 && r.getAs[Long]("chunk_start") == 0L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[String]("chunk_text") == "w0 w1 w2")
  }

  test("doc of exactly one window yields one full chunk") {
    val out = Chunking.chunk(
      Seq(doc(1L, 8)).toDF("doc_id", "text"), "doc_id", "text", 8, 4)
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_tokens") == 8L)
  }

  test("windows overlap by window - stride and stop once the end is covered") {
    // 10 tokens, window 8, stride 4 -> starts 0 and 4; no start-8 tail
    // (window 4..11 already reaches the end)
    val out = Chunking.chunk(
      Seq(doc(1L, 10)).toDF("doc_id", "text"), "doc_id", "text", 8, 4)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getAs[Long]("chunk_start")).toSeq == Seq(0L, 4L))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(8L, 6L))
    // overlap: chunk 1 starts with the last 4 tokens of chunk 0
    val c0 = out(0).getAs[String]("chunk_text").split(" ")
    val c1 = out(1).getAs[String]("chunk_text").split(" ")
    assert(c0.takeRight(4).sameElements(c1.take(4)))
  }

  test("every token position is covered by some chunk") {
    val n = 103
    val out = Chunking.chunk(
      Seq(doc(1L, n)).toDF("doc_id", "text"), "doc_id", "text", 16, 11)
      .collect()
    val covered = out.flatMap { r =>
      val s = r.getAs[Long]("chunk_start")
      s until (s + r.getAs[Long]("n_tokens"))
    }.toSet
    assert(covered == (0L until n.toLong).toSet)
  }

  test("chunking is a shuffle-free stateless projection") {
    val df = Seq(doc(1L, 50), doc(2L, 5)).toDF("doc_id", "text")
    val plan = Chunking.chunk(df, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("dedupChunks keeps the lowest (id, chunk_id) and counts occurrences") {
    val docs = Seq(
      (1L, "a b c d"),   // one chunk "a b c d"
      (2L, "a b c d"),   // identical chunk -> deduped into doc 1
      (3L, "x y z w"))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, "doc_id", "text", 8, 4)
    val out = Chunking.dedupChunks(chunks, "doc_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(out == Set((1L, 0, 2L), (3L, 0, 1L)))
  }

  test("dedup groups on the md5 fingerprint in a single aggregation") {
    val docs = Seq(doc(1L, 50), doc(2L, 50)).toDF("doc_id", "text")
    val plan = Chunking.dedupChunks(
      Chunking.chunk(docs, "doc_id", "text", 8, 4), "doc_id")
      .queryExecution.executedPlan.toString
    // one hash aggregate pair around one exchange, keyed on the md5
    assert(plan.contains("md5"))
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("chunking is stateless: stream output equals batch row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, doc(1L, 20)._2), (2L, doc(2L, 3)._2))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val name = s"schunk_${System.nanoTime()}"
    val q = Chunking.chunk(in.toDF().toDF("doc_id", "text"), "doc_id", "text", 8, 4)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .as[(Long, Int, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      val batch = Chunking.chunk(rows.toDF("doc_id", "text"), "doc_id", "text", 8, 4)
        .as[(Long, Int, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(stream == batch)
      assert(stream.nonEmpty)
    } finally q.stop()
  }
}
