package graft

import graft.operators.SimilaritySearch
import graft.streaming.StreamMmr

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamMmr.diversityGate]] — the serving-time MMR twin: stream ==
  * batch bit-for-bit, and the gate's arithmetic agrees with
  * [[SimilaritySearch.mmrSelect]]'s own next-round scoring.
  */
class StreamMmrSpec extends SparkSpec {
  import spark.implicits._

  private val query = Seq(1.0f, 0.0f)
  private val corpus = Seq(
    (1L, Seq(0.95f, 0.312f)),
    (2L, Seq(0.95f, -0.312f)),
    (3L, Seq(0.99f, 0.141f)),
    (4L, Seq(0.0f, 1.0f)),
    (5L, Seq(0.6f, 0.8f)))

  test("diversity gate runs on a stream and equals the batch projection") {
    implicit val sqlCtx = spark.sqlContext
    // orthogonal to the query: query-aligned candidates keep, the
    // near-copy of the selected vector (vec 4) drops
    val selected = Seq(Seq(0.0f, 1.0f))
    val in = MemoryStream[(Long, Seq[Float])]
    val name = s"smmr_${System.nanoTime()}"
    val q = StreamMmr
      .diversityGate(in.toDF().toDF("vec_id", "embedding"), "embedding",
        query, selected, minScoreMicro = 100000L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(corpus: _*)
      q.processAllAvailable()
      val stream = spark.table(name)
        .select(col("vec_id"), col("rel_micro"), col("max_sim_micro"),
          col("score_micro"), col("keep"))
        .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val batch = StreamMmr
        .diversityGate(corpus.toDF("vec_id", "embedding"), "embedding",
          query, selected, minScoreMicro = 100000L)
        .select(col("vec_id"), col("rel_micro"), col("max_sim_micro"),
          col("score_micro"), col("keep"))
        .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(stream == batch)
      assert(stream.exists(_._5) && stream.exists(!_._5),
        s"fixture must exercise both keep verdicts: $stream")
    } finally q.stop()
  }

  test("gate scores equal mmrSelect's next-round arithmetic") {
    val df = corpus.toDF("vec_id", "embedding")
    val picks = SimilaritySearch
      .mmrSelect(df, "vec_id", "embedding", query, k = 3)
      .orderBy(col("rank")).collect()
    val firstTwo = picks.take(2).map(_.getLong(1)).toSet
    val selectedVecs = corpus.filter(p => firstTwo.contains(p._1)).map(_._2)
    val remaining = corpus.filterNot(p => firstTwo.contains(p._1))
    val gated = StreamMmr
      .diversityGate(remaining.toDF("vec_id", "embedding"), "embedding",
        query, selectedVecs)
      .select(col("vec_id"), col("score_micro"))
      .as[(Long, Long)].collect().toSeq
    // mmrSelect's third pick is the gate's argmax (score desc, id asc)
    val best = gated.minBy { case (id, s) => (-s, id) }
    assert(best._1 == picks(2).getLong(1), s"gate argmax $best vs mmr pick ${picks(2)}")
    assert(best._2 == picks(2).getLong(3), "third pick's score must match the gate score")
  }

  test("empty selected set gates on pure relevance") {
    val got = StreamMmr
      .diversityGate(corpus.toDF("vec_id", "embedding"), "embedding",
        query, selected = Seq.empty)
      .select(col("vec_id"), col("max_sim_micro"),
        (col("score_micro") === col("rel_micro")).as("pure"))
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.forall(r => r._2 == 0L && r._3))
  }
}
