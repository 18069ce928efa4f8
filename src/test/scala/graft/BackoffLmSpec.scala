package graft

import graft.operators.BackoffLm

import org.apache.spark.sql.functions._

class BackoffLmSpec extends SparkSpec {

  import spark.implicits._

  private def micro(p: Double): Long = math.floor(math.log(p) * 1e6).toLong
  private def avg(ms: Long*): Double =
    BigDecimal(ms.sum.toDouble / 1e6 / ms.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def trainCorpus = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")

  test("counts: three orders from one corpus") {
    val m = BackoffLm.train(trainCorpus, "doc_id", "text")
    try {
      assert(m.totalTokens == 6L)
      assert(m.unigrams.as[(String, Long)].collect().toMap ==
        Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
      assert(m.bigrams.as[(String, String, Long)].collect().toSet ==
        Set(("a", "b", 2L), ("b", "c", 1L), ("b", "d", 1L)))
      assert(m.trigrams.as[(String, String, String, Long)].collect().toSet ==
        Set(("a", "b", "c", 1L), ("a", "b", "d", 1L)))
    } finally m.unpersist()
  }

  test("in-corpus doc scores through all three orders, no penalty") {
    val m = BackoffLm.train(trainCorpus, "doc_id", "text")
    try {
      val r = BackoffLm.score(Seq((10L, "a b c")).toDF("doc_id", "text"), m, "doc_id", "text")
        .as[(Long, Long, Long, Long, Long, Double)].collect().head
      // a: 2/6 (uni); b|a: 2/2 (big, short context, no penalty); c|ab: 1/2 (tri)
      assert(r == ((10L, 3L, 1L, 1L, 1L,
        avg(micro(2.0 / 6.0), micro(2.0 / 2.0), micro(1.0 / 2.0)))))
    } finally m.unpersist()
  }

  test("held-out doc backs off with one penalty per skipped order") {
    val m = BackoffLm.train(trainCorpus, "doc_id", "text")
    try {
      val r = BackoffLm.score(Seq((11L, "a c d")).toDF("doc_id", "text"), m, "doc_id", "text")
        .as[(Long, Long, Long, Long, Long, Double)].collect().head
      // a: 2/6; c|a unseen bigram at pos 2 -> alpha * uni(c); d|ac unseen
      // trigram AND bigram -> alpha^2 * uni(d)
      assert(r == ((11L, 3L, 0L, 0L, 3L,
        avg(micro(2.0 / 6.0),
          micro(0.4 * (1.0 / 6.0)),
          micro(0.4 * 0.4 * (1.0 / 6.0))))))
    } finally m.unpersist()
  }

  test("seen bigram after unseen trigram takes one penalty only") {
    val m = BackoffLm.train(trainCorpus, "doc_id", "text")
    try {
      // c: uni 1/6; b|c: bigram (c,b) unseen -> alpha * uni(b);
      // c|(c b): trigram unseen, bigram (b,c) SEEN -> alpha * (1/2)
      val r = BackoffLm.score(Seq((12L, "c b c")).toDF("doc_id", "text"), m, "doc_id", "text")
        .as[(Long, Long, Long, Long, Long, Double)].collect().head
      assert(r._3 == 0L && r._4 == 1L && r._5 == 2L) // 0 tri, 1 big, 2 uni
      assert(r._6 == avg(
        micro(1.0 / 6.0),
        micro(0.4 * (2.0 / 6.0)),
        micro(0.4 * (1.0 / 2.0))))
    } finally m.unpersist()
  }

  test("unseen word scores as count 1") {
    val m = BackoffLm.train(trainCorpus, "doc_id", "text")
    try {
      val r = BackoffLm.score(Seq((13L, "zzz")).toDF("doc_id", "text"), m, "doc_id", "text")
        .as[(Long, Long, Long, Long, Long, Double)].collect().head
      assert(r == ((13L, 1L, 0L, 0L, 1L, avg(micro(1.0 / 6.0)))))
    } finally m.unpersist()
  }

  test("training plan is join-free (stateless context zip, no window)") {
    val m = BackoffLm.train(trainCorpus, "doc_id", "text")
    try {
      val plan = m.trigrams.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("join") && !plan.contains("window"), plan)
    } finally m.unpersist()
  }
}
