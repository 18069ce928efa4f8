package graft

import graft.operators.CorpusDrift

/** KL corpus drift: closed-form contributions on a tiny pair, identity
  * (zero drift on identical corpora), asymmetry, and mover ordering.
  */
class CorpusDriftSpec extends SparkSpec {
  import spark.implicits._

  private def q(x: Double): Long =
    math.floor(x * CorpusDrift.ContribScale).toLong

  test("closed-form contributions on a two-token pair") {
    // A: "a a b" -> c_a(a)=2, c_a(b)=1, N_a=3; B: "a b b b" -> c_b(a)=1,
    // c_b(b)=3, N_b=4; V=2
    val a = Seq((1L, "a a b")).toDF("doc_id", "text")
    val b = Seq((2L, "a b b b")).toDF("doc_id", "text")
    val rows = CorpusDrift.drift(a, b, "text").collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("c_a"), r.getAs[Long]("c_b"), r.getAs[Long]("lp_ab")))).toMap
    val paA = 3.0 / 5.0; val pbA = 2.0 / 6.0 // token "a"
    val paB = 2.0 / 5.0; val pbB = 4.0 / 6.0 // token "b"
    assert(rows("a") == ((2L, 1L, q(paA * math.log(paA / pbA)))))
    assert(rows("b") == ((1L, 3L, q(paB * math.log(paB / pbB)))))
  }

  test("identical corpora drift to ~zero; KL is asymmetric otherwise") {
    val a = Seq((1L, "x y z x"), (2L, "y z")).toDF("doc_id", "text")
    val same = CorpusDrift.summary(a, a, "text").collect().head
    // quantization floors each contribution, so "zero" is bounded by
    // vocab * 1 ulp of the scale, not exactly 0.0
    assert(math.abs(same.getAs[Double]("kl_ab")) <= 1e-6)
    assert(same.getAs[Long]("vocab") == 3L)

    val b = Seq((3L, "x x x x x x y")).toDF("doc_id", "text")
    val diff = CorpusDrift.summary(a, b, "text").collect().head
    assert(diff.getAs[Double]("kl_ab") > 0.0)
    assert(diff.getAs[Double]("kl_ab") != diff.getAs[Double]("kl_ba"))
  }

  test("top movers rank by absolute contribution with token tie-break") {
    val a = Seq((1L, "common common common rare_in_b")).toDF("doc_id", "text")
    val b = Seq((2L, "common surge surge surge surge")).toDF("doc_id", "text")
    val movers = CorpusDrift.topMovers(a, b, "text", k = 2).collect()
      .map(_.getAs[String]("token")).toSeq
    assert(movers.size == 2)
    // "surge" (0 -> 4) and "common" (3 -> 1) move most; exact order from
    // the quantized contributions
    assert(movers.toSet.subsetOf(Set("common", "surge", "rare_in_b")))
  }

  test("KS statistic: identical samples give 0, disjoint samples give 1") {
    import org.apache.spark.sql.functions.col
    val same = (1 to 10).flatMap(i => Seq(("g", i.toDouble, 0L), ("g", i.toDouble, 1L)))
      .toDF("g", "v", "side")
    val s = CorpusDrift.ksStatistic(same, Seq("g"), col("v"), col("side") === 1L)
      .select("ks_micro").as[Long].head()
    assert(s == 0L)
    // A entirely below B: at the boundary F_a = 1, F_b = 0 -> D = 1
    val disjoint = ((1 to 5).map(i => ("g", i.toDouble, 0L)) ++
      (11 to 15).map(i => ("g", i.toDouble, 1L))).toDF("g", "v", "side")
    val d = CorpusDrift.ksStatistic(disjoint, Seq("g"), col("v"), col("side") === 1L)
      .select("ks_micro").as[Long].head()
    assert(d == 1000000L)
  }

  test("KS statistic: hand-checked supremum on a small mix") {
    import org.apache.spark.sql.functions.col
    // A = {1, 2, 3, 4}, B = {3, 4, 5, 6}: sup|F_a - F_b| at v=2 is
    // |2/4 - 0/4| = 1/2
    val df = (Seq(1, 2, 3, 4).map(v => ("g", v.toDouble, 0L)) ++
      Seq(3, 4, 5, 6).map(v => ("g", v.toDouble, 1L))).toDF("g", "v", "side")
    val row = CorpusDrift.ksStatistic(df, Seq("g"), col("v"), col("side") === 1L)
      .select("n_a", "n_b", "d_num", "ks_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((4L, 4L, 8L, 500000L)), s"got $row")
  }
}
