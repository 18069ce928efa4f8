package graft

import graft.operators.Sampling

import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 1000).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "id")

  test("samplePerGroup: exactly k per group, deterministic across runs") {
    val s1 = Sampling.samplePerGroup(df, Seq("g"), Seq("id"), k = 5)
    val s2 = Sampling.samplePerGroup(df, Seq("g"), Seq("id"), k = 5)
    val counts = s1.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 5) && counts.size == 4)
    assert(s1.collect().map(_.toSeq).toSet == s2.collect().map(_.toSeq).toSet)
  }

  test("hashRate: rate is close to num/denom and stable") {
    val kept = Sampling.hashRate(df, Seq("id"), num = 1, denom = 4)
    val n = kept.count()
    assert(n > 150 && n < 350, s"expected ~250 of 1000, got $n")
    assert(kept.count() == n) // deterministic
  }
}
