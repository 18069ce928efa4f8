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

  test("MAD flags what a heavy tail hides from the z-score") {
    // 40 points at 10, a 10-point tail at 300, a 350 spike: the tail
    // inflates sigma to ~121, so NOTHING reaches 2.5 sigma (z(350) ~
    // 2.28, z(300) ~ 1.87); the median stays 10 and MAD is 0, so the
    // entire tail flags under the robust gate
    val vals = Seq.fill(40)(10.0) ++ Seq.fill(10)(300.0) :+ 350.0
    val df = vals.map(("g", _)).toDF("g", "v")
    val z = Outliers.zScoreOutliers(df, Seq("g"), col("v")).count()
    val mad = Outliers.madOutliers(df, Seq("g"), col("v"))
      .select("vmilli").as[Long].collect().toSeq
    assert(z == 0L, s"z-score path unexpectedly flagged $z rows")
    assert(mad.count(_ == 350000L) == 1 && mad.count(_ == 300000L) == 10,
      s"got $mad")
  }

  test("MAD median and MAD are discrete rank statistics (lower median)") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 10.0), ("g", 11.0)).toDF("g", "v")
    // n=4: median rank ceil(4/2)=2 -> 2.0; devs |v-2|: 0,1,8,9 -> MAD rank 2 -> 1
    val got = Outliers.madOutliers(df, Seq("g"), col("v"),
      thresholdNum = 7, thresholdDen = 1)
      .select("med_milli", "mad_milli", "vmilli")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // |v-2000| > 7*1000 -> 10.0 (8000) and 11.0 (9000) flag
    assert(got == Seq((2000L, 1000L, 10000L), (2000L, 1000L, 11000L)), s"got $got")
  }
}
