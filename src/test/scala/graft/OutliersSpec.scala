package graft

import graft.operators.Outliers

import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {

  import spark.implicits._

  test("flags exactly the rows beyond the rational threshold, per group") {
    // group a: nine 10.0s and one 110.0 -> mean 20, sigma_pop = 30
    //   z(110) = 3.0 > 2.5 -> flagged; z(10) = 1/3 -> not
    val a = Seq.fill(9)(("a", 10.0)) :+ (("a", 110.0))
    // group b: tight cluster, no outliers
    val b = Seq(("b", 5.0), ("b", 6.0), ("b", 5.5))
    val df = (a ++ b).toDF("g", "v")
    val got = Outliers.zScoreOutliers(df, Seq("g"), col("v"))
      .select("g", "vmilli").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 110000L)))
  }

  test("threshold boundary is exact: z == k does NOT flag (strict >)") {
    // two points: mean = (0+2)/2 = 1, sigma = 1; each z = 1 exactly
    val df = Seq(("g", 0.0), ("g", 2.0)).toDF("g", "v")
    assert(Outliers.zScoreOutliers(df, Seq("g"), col("v"),
      thresholdNum = 1, thresholdDen = 1).count() == 0L)
    // threshold just under 1 flags both
    assert(Outliers.zScoreOutliers(df, Seq("g"), col("v"),
      thresholdNum = 99, thresholdDen = 100).count() == 2L)
  }

  test("groups are independent: a spike in one never flags the other") {
    // n must exceed k^2+1: max attainable z in a sample is sqrt(n-1)
    val df = (Seq.fill(10)(("a", 1.0)) :+ (("a", 100.0)) :+ (("b", 100.0))).toDF("g", "v")
    val got = Outliers.zScoreOutliers(df, Seq("g"), col("v"))
      .select("g", "vmilli").as[(String, Long)].collect().toSeq
    // b's single row IS its whole distribution (sigma 0, d = 0) -> never flagged
    assert(got == Seq(("a", 100000L)))
  }

  test("zero-variance group flags nothing (0 > 0 is false)") {
    val df = Seq.fill(4)(("g", 7.0)).toDF("g", "v")
    assert(Outliers.zScoreOutliers(df, Seq("g"), col("v")).count() == 0L)
  }
}
