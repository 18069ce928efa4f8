package graft

import graft.operators.PageRank

import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def ranksOf(
      edges: Seq[(Long, Long)],
      nodes: Seq[Long],
      iters: Int): Map[Long, Long] =
    PageRank.rank(edges.toDF("src", "dst"), nodes.toDF("node"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("symmetric cycle is the fixed point: every rank stays at Unit") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    for (iters <- Seq(1, 3)) {
      val r = ranksOf(cycle, Seq(0L, 1L, 2L), iters)
      assert(r.values.toSet == Set(PageRank.Unit), s"iters=$iters: $r")
    }
  }

  test("star graph: hand-computed integer ranks, iteration by iteration") {
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    // r1(hub) = 150000 + (3_000_000 * 85) // 100 = 2_700_000; leaves teleport-only
    val r1 = ranksOf(star, nodes, 1)
    assert(r1(0L) == 2700000L)
    assert(Seq(1L, 2L, 3L).forall(r1(_) == 150000L))
    // r2(hub) = 150000 + (3 * 150000 * 85) // 100 = 532500
    val r2 = ranksOf(star, nodes, 2)
    assert(r2(0L) == 532500L)
    assert(Seq(1L, 2L, 3L).forall(r2(_) == 150000L))
  }

  test("outdeg splits mass exactly: two targets get the floor halves") {
    val edges = Seq((0L, 1L), (0L, 2L))
    val r1 = ranksOf(edges, Seq(0L, 1L, 2L), 1)
    // floor(1_000_000 / 2) = 500_000 each; 150000 + (500000*85)//100
    assert(r1(1L) == 150000L + 425000L)
    assert(r1(2L) == 150000L + 425000L)
    assert(r1(0L) == 150000L) // dangling-free node with no in-edges
  }

  test("parallel edges multiply contribution; ranks are partition-invariant") {
    val edges = Seq((0L, 1L), (0L, 1L), (0L, 2L), (2L, 1L))
    val nodes = Seq(0L, 1L, 2L)
    val a = ranksOf(edges, nodes, 3)
    val b = PageRank.rank(
      edges.toDF("src", "dst").repartition(7),
      nodes.toDF("node").repartition(3), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // node 1 receives 2/3 of 0's mass plus all of 2's: strictly above 2
    assert(a(1L) > a(2L))
  }

  test("nodes outside the edge set keep pure teleport mass") {
    val r = ranksOf(Seq((0L, 1L)), Seq(0L, 1L, 9L), 2)
    assert(r(9L) == 150000L)
  }
}
