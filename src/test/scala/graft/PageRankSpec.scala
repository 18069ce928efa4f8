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

  test("personalized rank: mass concentrates near the seed, unreachable nodes stay 0") {
    import graft.operators.PageRank
    // chain 0 -> 1 -> 2, isolated 9; seed {0}
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 9L).toDF("node")
    val seeds = Seq(0L).toDF("node")
    val r = PageRank.personalizedRank(edges, nodes, seeds, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    // hand-computed: r0 = (1e6, 0, 0, 0)
    // r1: seed teleport 150000; c(1) = 1e6 -> r1(1) = 850000; others 0
    //     r1(0) = 150000
    // r2: r2(0) = 150000; c(1) = r1(0) = 150000 -> r2(1) = 127500
    //     c(2) = r1(1) = 850000 -> r2(2) = 722500; r2(9) = 0
    assert(r == Map(0L -> 150000L, 1L -> 127500L, 2L -> 722500L, 9L -> 0L), s"got $r")
  }

  test("personalized rank with ALL nodes as seeds equals the global rank") {
    import graft.operators.PageRank
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 2L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val global = PageRank.rank(edges, nodes, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val personal = PageRank
      .personalizedRank(edges, nodes, nodes, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(personal == global)
  }
}
