package graft

import graft.operators.Graphs

import org.scalatest.funsuite.AnyFunSuite

/** HyperBall's estimated neighborhood function vs the exact all-pairs
  * twin: same depth range (the register fixpoint IS the diameter),
  * estimates inside the m=64 HLL error budget at every depth.
  */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  test("exact twin: path graph and a disconnected pair") {
    // path 1-2-3-4 plus component {8,9}:
    // t=0: 6 pairs; t=1: +2*3(path)+2 = +8 -> 14; t=2: +4 -> 18; t=3: +2 -> 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L)).toDF("a", "b")
    val got = Graphs.ballSizesExact(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 6L, 1L -> 14L, 2L -> 18L, 3L -> 20L))
  }

  test("estimate tracks exact within the m=64 budget on a clique-chain graph") {
    // ten 6-cliques chained by bridges: diameter 2*9+1 = 19
    val cliques = for {
      c <- 0L until 10L; i <- 0L until 6L; j <- (i + 1) until 6L
    } yield (c * 6 + i, c * 6 + j)
    val bridges = (0L until 9L).map(c => (c * 6 + 5, (c + 1) * 6))
    val edges = (cliques ++ bridges).toDF("a", "b")
    val est = Graphs.hyperBall(edges, "a", "b", m = 64)
      .as[(Long, Double)].collect().toMap
    val exact = Graphs.ballSizesExact(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    // the register fixpoint lands exactly at the diameter
    assert(est.keySet == exact.keySet)
    assert(est.keySet.max == 19L)
    exact.foreach { case (t, ex) =>
      val ratio = est(t) / ex
      assert(ratio > 0.75 && ratio < 1.25,
        s"t=$t est=${est(t)} exact=$ex ratio=$ratio")
    }
    // the neighborhood function is monotone in t
    val sorted = est.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => b >= a })
  }

  test("parameter guards") {
    val e = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](Graphs.hyperBall(e, "a", "b", m = 48))
    intercept[IllegalArgumentException](Graphs.hyperBall(e, "a", "b", m = 8))
  }
}
