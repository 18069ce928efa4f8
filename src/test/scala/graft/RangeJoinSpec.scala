package graft

import graft.operators.RangeJoin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: DataFrame, a: String, b: String): Set[(Int, Int)] =
    df.select(col(a), col(b)).as[(Int, Int)].collect().toSet

  test("pointInInterval: half-open semantics, bin-boundary points, negatives") {
    val pts = Seq((1, -5.0), (2, 0.0), (3, 10.0), (4, 19.99), (5, 20.0)).toDF("pid", "p")
    val ivs = Seq((10, -10.0, 0.0), (11, 0.0, 20.0), (12, 15.0, 25.0)).toDF("iid", "lo", "hi")
    val got = pairs(RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 7.0), "pid", "iid")
    // half-open: p=0.0 is NOT in [-10,0) but IS in [0,20); 20.0 not in [0,20)
    assert(got == Set((1, 10), (2, 11), (3, 11), (4, 11), (4, 12), (5, 12)))
    val closed = pairs(
      RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 7.0, closedHi = true),
      "pid", "iid")
    assert(closed == got + ((2, 10)) + ((5, 11)))
  }

  test("pointInInterval: differential vs naive cross-filter on 2k random rows") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(1000)(i => (i, (rnd.nextInt(2000) - 1000).toDouble)).toDF("pid", "p")
    val ivs = Seq.tabulate(1000) { i =>
      val lo = (rnd.nextInt(2000) - 1000).toDouble
      (i, lo, lo + rnd.nextInt(60))
    }.toDF("iid", "lo", "hi")
    val binned = pairs(RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 50.0), "pid", "iid")
    val naive = pairs(
      pts.crossJoin(ivs).filter(col("p") >= col("lo") && col("p") < col("hi")), "pid", "iid")
    assert(binned == naive)
  }

  test("intervalOverlap: exactly-once emission across shared bins") {
    // both intervals span many bins; overlap must be emitted once
    val a = Seq((1, 0.0, 100.0), (2, 300.0, 310.0)).toDF("aid", "alo", "ahi")
    val b = Seq((10, 50.0, 400.0), (11, 150.0, 200.0)).toDF("bid", "blo", "bhi")
    val out = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", binWidth = 10.0)
    val got = out.select("aid", "bid").as[(Int, Int)].collect().toList
    assert(got.sorted == List((1, 10), (2, 10)), s"got $got") // no duplicates, no (1,11)
  }

  test("intervalOverlap: differential vs naive cross-filter on 1k random intervals") {
    val rnd = new scala.util.Random(13)
    def mk(n: Int) = Seq.tabulate(n) { i =>
      val lo = (rnd.nextInt(1000) - 500).toDouble
      (i, lo, lo + rnd.nextInt(80))
    }
    val a = mk(500).toDF("aid", "alo", "ahi")
    val b = mk(500).toDF("bid", "blo", "bhi")
    val binned = pairs(
      RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", binWidth = 64.0), "aid", "bid")
    val naive = pairs(
      a.crossJoin(b).filter(col("alo") <= col("bhi") && col("blo") <= col("ahi")), "aid", "bid")
    assert(binned == naive)
  }

  test("binned plan is an equi-join: no nested-loop, no cartesian") {
    val pts = Seq((1, 5.0)).toDF("pid", "p")
    val ivs = Seq((10, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a product plan:\n$plan")
  }

  test("equality keys ride the bin shuffle") {
    val pts = Seq((1, "u1", 5.0), (2, "u2", 5.0)).toDF("pid", "k", "p")
    val ivs = Seq((10, "u1", 0.0, 10.0)).toDF("iid", "k", "lo", "hi")
    val got = pairs(
      RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", binWidth = 10.0, keys = Seq("k")),
      "pid", "iid")
    assert(got == Set((1, 10))) // u2's point must not match u1's interval
  }
}
