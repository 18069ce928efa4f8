package graft

import graft.functions.NearestCentroidL2

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** The r18 pruned nearest-centroid search (triangle-inequality group
  * pruning + partial-distance early exit, engaged at k >= 128) must be
  * BIT-IDENTICAL to the flat scan it replaced — same argmin, same
  * tie-to-lowest-index — at every k. The flat scan is re-implemented
  * here as the independent reference.
  */
class NearestCentroidPruneSpec extends AnyFunSuite {

  private def flatRef(vec: Seq[Long], centroids: Seq[Seq[Long]]): Int = {
    var best = 0
    var bestDist = BigInt(Long.MaxValue)
    for (i <- centroids.indices) {
      val d = vec.zip(centroids(i)).map { case (a, b) => BigInt(a - b) * BigInt(a - b) }.sum
      if (d < bestDist) { bestDist = d; best = i }
    }
    best
  }

  private def evalExpr(vec: Seq[Long], centroids: Seq[Seq[Long]]): Int =
    NearestCentroidL2(Literal.create(vec, ArrayType(LongType)), centroids)
      .eval(null).asInstanceOf[Int]

  private def randomCentroids(k: Int, dims: Int, seed: Long): IndexedSeq[IndexedSeq[Long]] = {
    val rng = new scala.util.Random(seed)
    // grid magnitudes: floor(x * 1e6) components up to ~1e7
    IndexedSeq.fill(k)(IndexedSeq.fill(dims)((rng.nextDouble() * 2e7 - 1e7).toLong))
  }

  test("pruned path (k >= 128) matches the flat reference on random grids") {
    val dims = 24
    val cents = randomCentroids(300, dims, seed = 42L)
    val rng = new scala.util.Random(7L)
    val queries =
      IndexedSeq.fill(300)(IndexedSeq.fill(dims)((rng.nextDouble() * 2e7 - 1e7).toLong)) ++
        cents.take(50) // exact hits: distance 0 to one centroid
    val expr = NearestCentroidL2(
      Literal.create(queries.head, ArrayType(LongType)), cents)
    queries.foreach { q =>
      val got = expr.nearestOf(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q.toArray))
      assert(got == flatRef(q, cents), s"query $q")
    }
  }

  test("clustered centroids (the Lloyd-output shape pruning exploits) still exact") {
    val dims = 16
    val rng = new scala.util.Random(11L)
    val centers = IndexedSeq.fill(20)(IndexedSeq.fill(dims)((rng.nextDouble() * 2e7 - 1e7).toLong))
    // 200 centroids jittered around 20 real centers — tight groups
    val cents = IndexedSeq.tabulate(200) { i =>
      centers(i % 20).map(_ + rng.between(-5000L, 5000L))
    }
    val expr = NearestCentroidL2(Literal.create(cents.head, ArrayType(LongType)), cents)
    val queries = IndexedSeq.fill(200)(
      centers(rng.nextInt(20)).map(_ + rng.between(-200000L, 200000L)))
    queries.foreach { q =>
      val got = expr.nearestOf(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q.toArray))
      assert(got == flatRef(q, cents))
    }
  }

  test("ties resolve to the LOWER centroid index through the pruned path") {
    val dims = 8
    val rng = new scala.util.Random(3L)
    val base = IndexedSeq.fill(150)(IndexedSeq.fill(dims)((rng.nextDouble() * 2e7 - 1e7).toLong))
    // plant exact duplicates at (5, 77) and (20, 140): a query at the
    // shared point must return the LOWER index, whatever group order
    // the pruner scans in
    val cents = base.updated(77, base(5)).updated(140, base(20))
    val expr = NearestCentroidL2(Literal.create(cents.head, ArrayType(LongType)), cents)
    def nearest(q: Seq[Long]): Int = expr.nearestOf(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q.toArray))
    assert(nearest(cents(77)) == 5)
    assert(nearest(cents(140)) == 20)
    // symmetric-offset tie: equidistant from two planted points
    val mid = cents(5).zip(cents(20)).map { case (a, b) => (a + b) / 2 }
    assert(nearest(mid) == flatRef(mid, cents))
  }

  test("flat path (k < 128) unchanged, and degenerate rows still land in bucket 0") {
    val cents = randomCentroids(64, 8, seed = 9L)
    val rng = new scala.util.Random(13L)
    val queries = IndexedSeq.fill(100)(IndexedSeq.fill(8)((rng.nextDouble() * 2e7 - 1e7).toLong))
    queries.foreach(q => assert(evalExpr(q, cents) == flatRef(q, cents)))
    // dimension mismatch -> 0 (both paths)
    assert(evalExpr(Seq(1L, 2L), cents) == 0)
    val big = randomCentroids(200, 8, seed = 15L)
    assert(evalExpr(Seq(1L, 2L), big) == 0)
  }
}
