package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression assigning an INTEGER-GRID vector to its
  * nearest centroid by squared Euclidean distance — the supervised
  * topic/semantic-bucket assignment step ([[NearestCentroid]] is its
  * cosine sibling for IVF coarse quantization).
  *
  * Everything is exact 64-bit integer arithmetic on the µ-grid
  * (`floor(x * 10^6)` components): distances are order-free and
  * engine-portable, so an assignment computed here hash-matches a SQL
  * replay of the same grid — no float-summation hazard can flip an
  * argmin. Bounds: |component| ≤ ~10^7 on the grid ⇒ diff² ≤ 4·10^14,
  * × 4096 dims ≤ 1.6·10^18 < 2^63.
  *
  * Ties break toward the lower centroid index; a null element or a
  * dimension-mismatched vector yields index 0 (degenerate rows land in
  * one inspectable bucket rather than erroring the scan).
  */
case class NearestCentroidL2(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.forall(_.length == centroids.head.length),
    "centroids must share one dimensionality")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nearest_centroid_l2"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid_l2 requires array<bigint> (grid-quantized), got ${other.catalogString}")
  }

  @transient private lazy val matrix: Array[Array[Long]] =
    centroids.map(_.toArray).toArray

  @transient private lazy val index: CentroidL2Index = new CentroidL2Index(matrix)

  override def nullSafeEval(input: Any): Any =
    nearestOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def nearestOf(arr: ArrayData): Int = {
    val dims = arr.numElements()
    if (dims != matrix.head.length) return 0
    val vec = new Array[Long](dims)
    var j = 0
    while (j < dims) {
      if (arr.isNullAt(j)) return 0
      vec(j) = arr.getLong(j)
      j += 1
    }
    index.nearest(vec)
  }

  /** Real whole-stage codegen — referenced-object pattern (see
    * [[NearestCentroid]]): the k-distance loop stays one JVM method,
    * the surrounding stage stays fused.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("nearestCentroidL2Expr", this, classOf[NearestCentroidL2].getName)
    defineCodeGen(ctx, ev, c => s"$self.nearestOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidL2 =
    copy(child = newChild)
}

/** EXACT nearest-centroid search over an integer-grid centroid matrix,
  * pruned so the per-row cost stops being O(k·d) when k grows with the
  * corpus (SemDeDup sizes k ∝ n, which made flat assignment O(n²/300)
  * over the whole corpus — the r17 sf16 finding: 7.4x at 4x data).
  *
  * Two prunes, both EXACT — the returned index is bit-identical to the
  * flat scan at every k (ties still resolve to the lower centroid
  * index), so no oracle or gate semantics move:
  *
  *   1. Triangle-inequality group pruning: the k centroids are grouped
  *      around ~√k representative points (a tiny deterministic Lloyd
  *      run over the CENTROIDS themselves — metadata-sized, built once
  *      per JVM via the expression's lazy index). For a query x and a
  *      group with representative r and radius R = max_c d(r, c), every
  *      member c satisfies √d(x,c) ≥ √d(x,r) − √R, so when the squared
  *      lower bound exceeds the best distance found so far the whole
  *      group is skipped without touching its members. The bound is
  *      evaluated in double with a CONSERVATIVE slack (≥ the worst-case
  *      long→double rounding of the ~2^60 squared-distance magnitudes),
  *      so float error can only weaken pruning, never flip a result.
  *   2. Partial-distance early exit: the per-centroid accumulation
  *      loop aborts once the partial sum exceeds the current best
  *      (strictly — an equal-distance later index must still lose the
  *      tie, which the final `dist == best && idx < bestIdx` check
  *      preserves).
  *
  * Groups are scanned in ascending distance-to-representative order so
  * `best` tightens as early as possible. Below `flatThreshold`
  * centroids the flat scan wins (no grouping overhead) and is kept
  * verbatim.
  */
private[functions] final class CentroidL2Index(matrix: Array[Array[Long]]) {
  private val k = matrix.length
  private val dims = matrix.head.length
  private val flatThreshold = 128

  // conservative absolute slack for the double-evaluated lower bound:
  // squared grid distances reach ~1.6e18 (ulp 512 as double); the
  // relative term covers sqrt/product rounding, the absolute term
  // covers the long->double conversions — pruning only ever weakens.
  @inline private def boundSlack(lb: Double): Double = 1e-9 * lb + 1e7

  private def distSq(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var d = 0
    while (d < dims) { val df = a(d) - b(d); s += df * df; d += 1 }
    s
  }

  // group structure (built only when k >= flatThreshold): reps on the
  // same integer grid, member index lists, squared radius per group
  private val (reps, members, radii): (Array[Array[Long]], Array[Array[Int]], Array[Long]) =
    if (k < flatThreshold) (null, null, null)
    else {
      val g = math.min(256, math.ceil(math.sqrt(k.toDouble)).toInt)
      // seeds: evenly spaced centroid indices (deterministic)
      var rep = Array.tabulate(g)(j => matrix(((j.toLong * k) / g).toInt).clone())
      val assign = new Array[Int](k)
      var iter = 0
      while (iter < 3) {
        // assign each centroid to its nearest representative
        var i = 0
        while (i < k) {
          var bi = 0; var bd = Long.MaxValue
          var j = 0
          while (j < g) {
            val d = distSq(matrix(i), rep(j))
            if (d < bd) { bd = d; bi = j }
            j += 1
          }
          assign(i) = bi
          i += 1
        }
        if (iter < 2) {
          // recompute representatives as per-dimension floor means
          val sums = Array.ofDim[Long](g, dims)
          val counts = new Array[Long](g)
          i = 0
          while (i < k) {
            val j = assign(i); val c = matrix(i)
            var d = 0
            while (d < dims) { sums(j)(d) += c(d); d += 1 }
            counts(j) += 1
            i += 1
          }
          rep = Array.tabulate(g) { j =>
            if (counts(j) == 0) rep(j)
            else Array.tabulate(dims)(d => Math.floorDiv(sums(j)(d), counts(j)))
          }
        }
        iter += 1
      }
      val byGroup = Array.fill(g)(new scala.collection.mutable.ArrayBuffer[Int])
      var i = 0
      while (i < k) { byGroup(assign(i)) += i; i += 1 }
      val nonEmpty = (0 until g).filter(byGroup(_).nonEmpty)
      val r = nonEmpty.map(rep(_)).toArray
      val m = nonEmpty.map(byGroup(_).toArray).toArray
      val rad = nonEmpty.map(j => byGroup(j).map(i => distSq(matrix(i), rep(j))).max).toArray
      (r, m, rad)
    }

  def nearest(vec: Array[Long]): Int = {
    if (reps == null) return flatNearest(vec)
    val g = reps.length
    val dg = new Array[Long](g)
    var j = 0
    while (j < g) { dg(j) = distSq(vec, reps(j)); j += 1 }
    // ascending order of distance-to-representative (g <= 256)
    val order = Array.tabulate(g)(identity)
    // insertion sort on dg — g is tiny and this avoids boxing
    var a = 1
    while (a < g) {
      val o = order(a); val key = dg(o)
      var b = a - 1
      while (b >= 0 && dg(order(b)) > key) { order(b + 1) = order(b); b -= 1 }
      order(b + 1) = o
      a += 1
    }
    var best = Long.MaxValue
    var bestIdx = Int.MaxValue
    var oi = 0
    while (oi < g) {
      val gi = order(oi)
      val dRep = dg(gi)
      val rad = radii(gi)
      val prune =
        if (best == Long.MaxValue) false
        else if (dRep <= rad) false
        else {
          val dd = dRep.toDouble; val rr = rad.toDouble
          val lb = dd + rr - 2.0 * math.sqrt(dd * rr)
          lb - boundSlack(lb) > best.toDouble
        }
      if (!prune) {
        val mem = members(gi)
        var mi = 0
        while (mi < mem.length) {
          val idx = mem(mi)
          val c = matrix(idx)
          var dist = 0L
          var d = 0
          while (d < dims && dist <= best) {
            val df = vec(d) - c(d); dist += df * df; d += 1
          }
          if (d == dims &&
            (dist < best || (dist == best && idx < bestIdx))) {
            best = dist; bestIdx = idx
          }
          mi += 1
        }
      }
      oi += 1
    }
    bestIdx
  }

  private def flatNearest(vec: Array[Long]): Int = {
    var best = 0
    var bestDist = Long.MaxValue
    var i = 0
    while (i < k) {
      val c = matrix(i)
      var dist = 0L
      var d = 0
      while (d < dims && dist < bestDist) {
        val df = vec(d) - c(d); dist += df * df; d += 1
      }
      if (d == dims && dist < bestDist) { bestDist = dist; best = i }
      i += 1
    }
    best
  }
}
