package graft

import graft.functions.NearestCentroid

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** The r19 pruned cosine nearest-centroid search (Cauchy–Schwarz group
  * pruning over ~√k representative points, engaged at k >= 128) must
  * be BIT-IDENTICAL to the flat argmax-dot scan it replaced — same
  * argmax, same tie-to-lowest-index — at every k. The flat scan is
  * re-implemented here as the independent reference, including the
  * expression's own unit-normalization of the centroid matrix (the
  * compared doubles must be the exact values the old loop compared).
  */
class CentroidDotPruneSpec extends AnyFunSuite {

  private def normalize(c: Seq[Double]): Array[Double] = {
    val arr = c.toArray
    val n = math.sqrt(arr.map(x => x * x).sum)
    if (n == 0.0) arr else arr.map(_ / n)
  }

  /** Independent flat reference: strict `>` in ascending index order
    * (lowest index wins ties), identical fold order.
    */
  private def flatRef(vec: Seq[Double], centroids: Seq[Seq[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    val norm = centroids.map(normalize)
    for (i <- norm.indices) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * norm(i)(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = i }
    }
    best
  }

  private def prunedOf(expr: NearestCentroid, q: Seq[Double]): Int =
    expr.nearestOf(ArrayData.toArrayData(q.map(_.toFloat).toArray))

  private def exprFor(cents: Seq[Seq[Double]]): NearestCentroid =
    NearestCentroid(
      Literal.create(Seq.empty[Float], ArrayType(FloatType)), cents)

  // float-grid values so the float->double widening in the expression
  // is exact against the double reference
  private def fvals(rng: scala.util.Random, dims: Int): IndexedSeq[Double] =
    IndexedSeq.fill(dims)(((rng.nextDouble() * 4.0 - 2.0).toFloat).toDouble)

  test("pruned path (k >= 128) matches the flat reference on random vectors") {
    val dims = 48
    val rng = new scala.util.Random(42L)
    val cents = IndexedSeq.fill(300)(fvals(rng, dims))
    val expr = exprFor(cents)
    val queries = IndexedSeq.fill(400)(fvals(rng, dims)) ++ cents.take(50)
    queries.foreach { q =>
      assert(prunedOf(expr, q) == flatRef(q, cents), s"query $q")
    }
  }

  test("clustered centroids (the Lloyd-output shape pruning exploits) still exact") {
    val dims = 32
    val rng = new scala.util.Random(11L)
    val centers = IndexedSeq.fill(18)(fvals(rng, dims))
    val cents = IndexedSeq.tabulate(220) { i =>
      centers(i % 18).zipWithIndex.map { case (x, d) =>
        (x + ((rng.nextInt(2001) - 1000) / 1e5).toFloat.toDouble).toFloat.toDouble
      }
    }
    val expr = exprFor(cents)
    val queries = IndexedSeq.fill(300)(
      centers(rng.nextInt(18)).map(x => ((x + rng.nextGaussian() * 0.05).toFloat).toDouble))
    queries.foreach { q =>
      assert(prunedOf(expr, q) == flatRef(q, cents))
    }
  }

  test("ties resolve to the LOWER centroid index through the pruned path") {
    val dims = 16
    val rng = new scala.util.Random(3L)
    val base = IndexedSeq.fill(160)(fvals(rng, dims))
    // exact duplicates at (5, 97) and (20, 150): equal normalized
    // vectors give the identical computed dot, so the query must
    // return the LOWER index whatever group order the pruner scans in
    val cents = base.updated(97, base(5)).updated(150, base(20))
    val expr = exprFor(cents)
    assert(prunedOf(expr, base(5)) == flatRef(base(5), cents))
    assert(prunedOf(expr, base(20)) == flatRef(base(20), cents))
    assert(prunedOf(expr, base(5)) == 5)
    assert(prunedOf(expr, base(20)) == 20)
  }

  test("degenerate queries: zero vector and NaN elements match the flat path") {
    val dims = 12
    val rng = new scala.util.Random(7L)
    val cents = IndexedSeq.fill(200)(fvals(rng, dims))
    val expr = exprFor(cents)
    val zero = IndexedSeq.fill(dims)(0.0)
    assert(prunedOf(expr, zero) == flatRef(zero, cents))
    val withNaN = fvals(rng, dims).updated(3, Double.NaN)
    assert(prunedOf(expr, withNaN) == flatRef(withNaN, cents))
  }

  test("below the flat threshold the flat scan is kept verbatim") {
    val dims = 8
    val rng = new scala.util.Random(5L)
    val cents = IndexedSeq.fill(64)(fvals(rng, dims))
    val expr = exprFor(cents)
    (1 to 100).map(_ => fvals(rng, dims)).foreach { q =>
      assert(prunedOf(expr, q) == flatRef(q, cents))
    }
  }
}
