package graft

import graft.operators.Clustering

import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Reference union-find on the driver. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chains, cliques, and singleton-free output") {
    // chain 5-4-3-2-1 (worst diameter), separate triangle, separate pair
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    val got = components(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("differential vs union-find on a 1k-edge random graph") {
    val rnd = new scala.util.Random(99)
    val edges = Seq.fill(1000)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter(e => e._1 != e._2)
    assert(components(edges) == unionFind(edges))
  }

  test("duplicate and reversed edges are tolerated") {
    val got = components(Seq((1L, 2L), (2L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty pair set yields empty labeling") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("a", "b")
    assert(Clustering.connectedComponents(empty, "a", "b").count() == 0)
  }
}
