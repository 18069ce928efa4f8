package graft

import graft.operators.SimilaritySearch

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** [[SimilaritySearch.mmrSelectSharded]] — corpus-scale bucketed MMR.
  * The contract under test: (1) within every shard the selection is
  * EXACTLY the greedy [[SimilaritySearch.mmrSelect]] would make on
  * that shard's candidates alone (same µ-grid scores, same tie
  * order); (2) the number of Spark jobs the operator runs does not
  * grow with `numShards` — the driver loop is over the per-shard
  * batch size only, so corpus-scale selection cannot degenerate into
  * corpus-scaled driver rounds.
  */
class MmrShardedSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vec(seed: Long): Seq[Float] =
    Seq.tabulate(dim)(j => (((seed * 31 + j * 17) % 23).toFloat - 11f) / 7f)

  private val query = vec(997L)
  private lazy val corpus =
    (1L to 48L).map(i => (i, vec(i))).toDF("vec_id", "embedding").persist()

  test("every shard's selection equals mmrSelect run on that shard alone") {
    val numShards = 4
    val sharded = SimilaritySearch
      .mmrSelectSharded(corpus, "vec_id", "embedding", query,
        kPerShard = 3, numShards = numShards)
      .collect()
      .groupBy(_.getLong(0))
    val shardOf = corpus
      .select(col("vec_id"), pmod(xxhash64(col("vec_id")), lit(numShards.toLong)).as("s"))
      .as[(Long, Long)].collect().toMap
    (0L until numShards.toLong).foreach { s =>
      val members = shardOf.filter(_._2 == s).keySet
      assume(members.size >= 3, s"fixture left shard $s too small")
      val solo = SimilaritySearch
        .mmrSelect(corpus.filter(col("vec_id").isin(members.toSeq: _*)),
          "vec_id", "embedding", query, k = 3)
        .orderBy(col("rank"))
        .select(col("rank"), col("id"), col("rel_micro"), col("score_micro"))
        .as[(Int, Long, Long, Long)].collect().toSeq
      val got = sharded(s).sortBy(_.getInt(1))
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(got == solo, s"shard $s diverged from the per-shard greedy")
    }
  }

  test("job count is flat as numShards scales (no corpus-scaled driver loops)") {
    def jobsDuring(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = { counter.incrementAndGet(); () }
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(300) } // let queued listener events drain
      finally spark.sparkContext.removeSparkListener(l)
      counter.get()
    }
    val j2 = jobsDuring {
      SimilaritySearch.mmrSelectSharded(corpus, "vec_id", "embedding", query,
        kPerShard = 2, numShards = 2).count(); ()
    }
    val j12 = jobsDuring {
      SimilaritySearch.mmrSelectSharded(corpus, "vec_id", "embedding", query,
        kPerShard = 2, numShards = 12).count(); ()
    }
    assert(j12 == j2, s"jobs grew with numShards: $j2 -> $j12")
  }

  test("a shard smaller than kPerShard yields its full membership, ranked") {
    // one lone id in its own shard via an explicit shard expression
    val df = Seq((1L, vec(1)), (2L, vec(2)), (3L, vec(3))).toDF("vec_id", "embedding")
    val out = SimilaritySearch
      .mmrSelectSharded(df, "vec_id", "embedding", query, kPerShard = 2,
        numShards = 2, shardBy = Some(when(col("vec_id") === 3, 1L).otherwise(0L)))
      .collect()
    assert(out.count(_.getLong(0) == 1L) == 1, "the lone shard must yield one row")
    assert(out.count(_.getLong(0) == 0L) == 2)
  }
}
