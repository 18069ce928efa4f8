package graft

import graft.operators.{MarketBasket, Profiling, TimeSeries}

import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("interpolation is exact on a straight segment and at observations") {
    // obs at t=0 (v=0) and t=100 (v=1000): grid every 10s
    val df = Seq(("u", 0L, 0.0), ("u", 100L, 1.0)).toDF("k", "t", "v")
    val got = TimeSeries.interpolateAtGrid(df, "k",
      col("t"), floor(col("v") * 1e3).cast("long"), stepS = 10L)
      .orderBy(col("t_s"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got.size == 11)                      // 0, 10, ..., 100
    assert(got.head == (("u", 0L, 0L)))         // exact hit
    assert(got(5) == (("u", 50L, 500L)))        // midpoint
    assert(got.last == (("u", 100L, 1000L)))    // exact hit at the end
  }

  test("falling segments truncate toward zero (div/// parity)") {
    // v drops 0 -> -1000 over 0..100: at t=33 raw is -330 exactly
    // but at t=10 slope term is -100 exactly; use a non-divisible case:
    // obs (0, 0) and (3, -5): grid step 1 -> t=1: trunc(-5*1/3) = -1
    val df = Seq(("u", 0L, 0L), ("u", 3L, -5L)).toDF("k", "t", "vm")
    val got = TimeSeries.interpolateAtGrid(df, "k", col("t"), col("vm"), stepS = 1L)
      .orderBy(col("t_s")).as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("u", 0L, 0L), ("u", 1L, -1L), ("u", 2L, -3L), ("u", 3L, -5L)),
      s"got $got")
  }

  test("keys interpolate independently; grid stays inside each span") {
    val df = Seq(("a", 0L, 0L), ("a", 20L, 200L), ("b", 100L, 7L), ("b", 110L, 7L))
      .toDF("k", "t", "vm")
    val got = TimeSeries.interpolateAtGrid(df, "k", col("t"), col("vm"), stepS = 10L)
      .orderBy(col("k"), col("t_s")).as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 0L, 0L), ("a", 10L, 100L), ("a", 20L, 200L),
      ("b", 100L, 7L), ("b", 110L, 7L)), s"got $got")
  }

  test("lag1Autocorr: monotone ramp ~ +1, alternating series -1, flat drops") {
    val ramp = (0L to 9L).map(t => ("up", t, 0L, t * 10))
    val alt = (0L to 9L).map(t => ("alt", t, 0L, if (t % 2 == 0) 0L else 100L))
    val flat = (0L to 9L).map(t => ("flat", t, 0L, 7L))
    val df = (ramp ++ alt ++ flat).toDF("k", "t", "tie", "v")
    val got = TimeSeries.lag1Autocorr(df, "k", col("t"), col("tie"), col("v"))
      .orderBy(col("k")).as[(String, Long, Double)].collect().toSeq
    val byK = got.map(r => r._1 -> r._3).toMap
    assert(!byK.contains("flat"), s"flat series must drop: $got")
    assert(byK("alt") < -0.99, s"alternating r1 ${byK("alt")}")
    assert(byK("up") > 0.99, s"ramp r1 ${byK("up")}")
    assert(got.forall(_._2 == 9L)) // 10 points -> 9 pairs
  }

  test("mutual information: independent columns score 0, copies score ln(k)") {
    val indep = (0 until 64).map(i => (s"a${i % 2}", s"b${(i / 2) % 2}")).toDF("x", "y")
    val mi0 = Profiling.mutualInformation(indep, "x", "y")
      .select("mi_nats").as[Double].head()
    assert(mi0 == 0.0, s"independent MI $mi0")
    val copy = (0 until 64).map(i => (s"v${i % 4}", s"w${i % 4}")).toDF("x", "y")
    val mi = Profiling.mutualInformation(copy, "x", "y")
      .select("mi_nats").as[Double].head()
    assert(math.abs(mi - math.log(4.0)) < 1e-5, s"copy MI $mi vs ${math.log(4.0)}")
  }

  test("basket pair lift: always-together pair lifts above popular-but-independent") {
    // baskets: {x,y} three times -> lift = 3*N/(3*3); {p,q},{p,r},{q,r}
    // each once with p,q,r in 2 baskets each
    val rows = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "y"),
      (4L, "p"), (4L, "q"), (5L, "p"), (5L, "r"), (6L, "q"), (6L, "r"))
    val got = MarketBasket.pairLift(rows.toDF("bk", "it"), "bk", "it",
      minSupport = 1L, topK = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val xy = got.find(r => r._1 == "x" && r._2 == "y").get
    assert(xy._3 == 3L && xy._6 == 2000000L, s"got $xy") // 3*6/(3*3) = 2.0
    val pq = got.find(r => r._1 == "p" && r._2 == "q").get
    assert(pq._3 == 1L && pq._6 == 1500000L, s"got $pq") // 1*6/(2*2) = 1.5
  }
}
