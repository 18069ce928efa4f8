package graft

import graft.operators.BloomJoin

import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  private def big = (0L until 1000L).map(i => (i, s"row$i")).toDF("k", "payload")
  private def small = Seq(3L, 17L, 999L, 123L).toDF("sk")

  test("bloom semi-join is identical to the plain semi-join") {
    val got = BloomJoin.semiJoin(big, "k", small, "sk")
      .select("k").as[Long].collect().sorted.toSeq
    val plain = big.join(small, col("k") === col("sk"), "left_semi")
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == plain && got == Seq(3L, 17L, 123L, 999L))
  }

  test("bloom inner join is identical to the plain inner join") {
    val got = BloomJoin.innerJoin(big, "k", small, "sk")
      .select("k", "sk", "payload").as[(Long, Long, String)].collect().toSet
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "sk", "payload").as[(Long, Long, String)].collect().toSet
    assert(got == plain && got.size == 4)
  }

  test("the probe filters before the join: prefiltered row count is near-selective") {
    val pre = BloomJoin.prefiltered(big, "k", small, "sk")
    val n = pre.count()
    // 4 true keys; fp-rate at this geometry is ~0 for 1000 probes
    assert(n >= 4L && n <= 20L, s"prefilter kept $n of 1000 rows")
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"), s"expected bloom_contains filter in:\n$plan")
    assert(plan.contains("Broadcast"), s"expected broadcast bloom in:\n$plan")
  }

  test("a tiny/saturated bloom still yields the exact join result") {
    // 64 bits for 1000 keys: the filter saturates, passes ~everything,
    // and the join still produces the exact answer
    val got = BloomJoin.semiJoin(big, "k", small, "sk", numBits = 64, numHashes = 2)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 17L, 123L, 999L))
  }
}
