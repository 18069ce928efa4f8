package graft

import graft.operators.Graphs

import org.apache.spark.sql.functions._

/** Triangle counts / clustering coefficients vs brute force on
  * hand-built and random graphs.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteTriangles(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val e = edges.map { case (a, b) => (a min b, a max b) }.filter(p => p._1 != p._2)
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq
    val tris = for {
      a <- nodes; b <- nodes; c <- nodes
      if a < b && b < c && e((a, b)) && e((a, c)) && e((b, c))
    } yield (a, b, c)
    tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  test("closed form on a clique plus a pendant") {
    // K4 on 1..4 (4 triangles, each node in 3) plus pendant 5-1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 1L))
    val tri = Graphs.nodeTriangles(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val stats = Graphs.triangleStats(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // wedges: deg 1:4,2:3,3:3,4:3,5:1 -> 6+3+3+3+0 = 15; gcc = 12/15
    assert(stats == ((5L, 7L, 15L, 4L, 800000L)), s"got $stats")
    val lcc = Graphs.clusteringCoefficient(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    // node 1: deg 4, 3 triangles -> 6/12 = 0.5; nodes 2-4: 3/ (3*2/2)=1; 5: deg 1 -> 0
    assert(lcc == Map(1L -> 500000L, 2L -> 1000000L, 3L -> 1000000L,
      4L -> 1000000L, 5L -> 0L), s"got $lcc")
  }

  test("duplicate, reversed, and self edges collapse before counting") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    val tri = Graphs.nodeTriangles(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("differential vs brute force on a random graph") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val got = Graphs.nodeTriangles(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == bruteTriangles(edges.toSet), "per-node counts diverged")
  }

  private def brutePeel(edges: Set[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges.map { case (a, b) => (a min b, a max b) }.filter(p => p._1 != p._2)
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, v) => n -> v.size }
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      changed = e2 != e
      e = e2
    }
    e.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (n, v) => n -> v.size.toLong }
  }

  test("kCore peels a pendant chain round by round, keeps the clique") {
    // 5-clique 1..5, chain 5-10-11-12: k=2 peels 12, then 11, then 10
    val edges = (for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)) ++
      Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val got = Graphs.kCore(edges.toDF("a", "b"), "a", "b", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 5L).map(_ -> 4L).toMap, s"got $got")
    // k above the clique degree: nothing survives
    assert(Graphs.kCore(edges.toDF("a", "b"), "a", "b", k = 5).count() == 0)
  }

  test("kCore differential vs brute-force peeling on a random graph") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(250)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(p => p._1 != p._2)
    (1 to 4).foreach { k =>
      val got = Graphs.kCore(edges.toDF("a", "b"), "a", "b", k)
        .as[(Long, Long)].collect().toMap
      assert(got == brutePeel(edges.toSet, k), s"k=$k diverged")
    }
  }

  test("coreness closed form: clique members get size-1, chain nodes get 1") {
    // K5 on 1..5, a 3-node chain hanging off node 1, an isolated edge
    val clique = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val chain = Seq((1L, 10L), (10L, 11L), (11L, 12L))
    val pair = Seq((100L, 101L))
    val got = Graphs.coreness((clique ++ chain ++ pair).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val want = (1L to 5L).map(_ -> 4L).toMap ++
      Map(10L -> 1L, 11L -> 1L, 12L -> 1L, 100L -> 1L, 101L -> 1L)
    assert(got == want, s"got $got")
  }

  test("coreness differential: {coreness >= k} equals the kCore node set for every k") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(250)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(p => p._1 != p._2)
    val cn = Graphs.coreness(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val maxCore = cn.values.max
    (1L to maxCore).foreach { k =>
      val fromCoreness = cn.filter(_._2 >= k).keySet
      val fromKcore = Graphs.kCore(edges.toDF("a", "b"), "a", "b", k.toInt)
        .as[(Long, Long)].collect().map(_._1).toSet
      assert(fromCoreness == fromKcore, s"k=$k diverged")
    }
    // and nothing survives past the degeneracy
    assert(Graphs.kCore(edges.toDF("a", "b"), "a", "b", maxCore.toInt + 1).count() == 0)
  }

  test("coreness/kCore: driver fast path == distributed peeling") {
    val rnd = new scala.util.Random(17)
    val clique = for { a <- 1L to 6L; b <- 1L to 6L if a < b } yield (a, b)
    val random = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    for (edges <- Seq(clique ++ random, (1L until 30L).map(i => (i, i + 1)))) {
      val fast = Graphs.coreness(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val loop = Graphs.coreness(edges.toDF("a", "b"), "a", "b",
          driverMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(fast == loop, "coreness paths diverged")
      val maxCore = fast.values.max.toInt
      (1 to maxCore).foreach { k =>
        val f = Graphs.kCore(edges.toDF("a", "b"), "a", "b", k)
          .as[(Long, Long)].collect().toMap
        val l = Graphs.kCore(edges.toDF("a", "b"), "a", "b", k,
            driverMaxEdges = 0L)
          .as[(Long, Long)].collect().toMap
        assert(f == l, s"kCore k=$k paths diverged")
      }
    }
  }

  test("coreness under maxRounds exhaustion reports the proven level, never more") {
    // a 20-node path peels two endpoints per round at threshold 2;
    // maxRounds=3 truncates mid-peel — survivors are PROVEN only into
    // the 1-core, so every reported coreness must be exactly 1
    // (distributed loop forced: the fast path never truncates)
    val path = (1L until 20L).map(i => (i, i + 1))
    val got = Graphs.coreness(path.toDF("a", "b"), "a", "b", maxRounds = 3,
        driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 1L), s"overstated coreness: $got")
    assert(got.keySet == (1L to 20L).toSet, s"nodes lost: ${got.keySet}")
  }

  test("coreness on an empty graph is empty") {
    assert(Graphs.coreness(Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").count() == 0)
  }

  test("triangle-free and empty graphs") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Graphs.nodeTriangles(path.toDF("a", "b"), "a", "b").count() == 0)
    val stats = Graphs.triangleStats(path.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(stats == ((4L, 3L, 2L, 0L, 0L)))
    val empty = Graphs.triangleStats(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(empty == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("bfs: path-graph distances from one seed, unreached absent") {
    // path 1-2-3-4-5, isolated edge 8-9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    val got = Graphs.bfsDistances(edges.toDF("a", "b"), "a", "b",
      Seq(1L).toDF("id")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("bfs: multi-source takes the minimum over seeds; direction ignored") {
    // seeds at both ends of the path; edges listed in mixed direction
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L))
    val got = Graphs.bfsDistances(edges.toDF("a", "b"), "a", "b",
      Seq(1L, 5L).toDF("id")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("bfs: maxDepth caps honestly; a seed outside the graph settles at 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val got = Graphs.bfsDistances(edges.toDF("a", "b"), "a", "b",
      Seq(1L, 99L).toDF("id"), maxDepth = 2).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 99L -> 0L))
  }
}
