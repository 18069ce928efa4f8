package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression assigning a vector to its
  * highest-cosine centroid: the coarse-quantization step of an IVF
  * (inverted-file) ANN index. Returns the centroid index in
  * [0, centroids.length).
  *
  * The centroid matrix is embedded in the expression (centroids are
  * driver-computed, k x dims doubles — a few KB), pre-normalized once
  * per instance so per-row work is k dot products in a tight loop. The
  * HOF alternative (argmax over k `aggregate` columns) would pay
  * interpreted lambda dispatch on every element of every centroid —
  * same hazard [[HyperplaneSignature]] eliminated.
  *
  * Ties break toward the lower index; a null element or an empty /
  * dimension-mismatched vector yields index 0 rather than an error
  * (degenerate vectors all land in one probe-able bucket).
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nearest_centroid"

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires array<float|double>, got ${other.catalogString}")
  }

  /** Unit-normalized centroid matrix, row-major; zero centroids stay zero. */
  @transient private lazy val normalized: Array[Array[Double]] =
    centroids.map { c =>
      val arr = c.toArray
      val n = math.sqrt(arr.map(x => x * x).sum)
      if (n == 0.0) arr else arr.map(_ / n)
    }.toArray

  @transient private lazy val index: CentroidDotIndex = new CentroidDotIndex(normalized)

  override def nullSafeEval(input: Any): Any =
    nearestOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def nearestOf(arr: ArrayData): Int = {
    val dims = arr.numElements()
    if (dims != normalized.head.length) return 0
    val vec = new Array[Double](dims)
    var j = 0
    while (j < dims) {
      if (arr.isNullAt(j)) return 0
      vec(j) = elementType match {
        case FloatType => arr.getFloat(j).toDouble
        case DoubleType => arr.getDouble(j)
      }
      j += 1
    }
    // cosine argmax == dot argmax against unit centroids (vector norm is
    // a positive constant across candidates)
    index.nearest(vec)
  }

  /** Real whole-stage codegen (not CodegenFallback — the fallback trait
    * ejects the entire enclosing stage from whole-stage codegen). The
    * k-dot-products loop stays one JVM method on a referenced
    * expression object (pre-normalized centroid matrix included); the
    * surrounding stage stays fused in generated code.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("nearestCentroidExpr", this, classOf[NearestCentroid].getName)
    defineCodeGen(ctx, ev, c => s"$self.nearestOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** EXACT argmax-dot search over a UNIT-normalized centroid matrix,
  * pruned so the per-row cost stops being O(k·d) when `nlist` grows
  * with the corpus (IVF sizes nlist ∝ n, which made the flat
  * assignment scan O(n²·d/2000) over the whole corpus — the r18 sf16
  * finding on `knn_classify_ann`, the same shape [[CentroidL2Index]]
  * retired for the L2 family in r18).
  *
  * One prune, EXACT — the returned index is bit-identical to the flat
  * scan at every k (same computed dot per candidate, same
  * ties-to-lower-index winner), so no oracle or gate semantics move:
  *
  * Cauchy–Schwarz group pruning. The k unit centroids are grouped
  * around ~√k representative points (a tiny deterministic Lloyd run
  * over the CENTROIDS themselves — metadata-sized, built once per JVM
  * via the expression's lazy index). For a query x and a group with
  * representative r and Euclidean radius R = max_c ‖ĉ − r‖,
  *
  *   dot(x, ĉ) = dot(x, r) + dot(x, ĉ − r) ≤ dot(x, r) + ‖x‖·R,
  *
  * so when that upper bound sits below the best dot found so far the
  * whole group is skipped without touching its members. The bound is
  * evaluated in double with a CONSERVATIVE slack (orders of magnitude
  * above the worst-case rounding of the ≤4096-term fold), so float
  * error can only weaken pruning, never flip a result. Groups are
  * scanned in DESCENDING bound order so `best` tightens immediately;
  * per-member dots accumulate in the same element order as the flat
  * loop, so the compared values are the identical doubles. Below
  * `flatThreshold` centroids the flat scan wins (no grouping overhead)
  * and is kept verbatim.
  */
private[functions] final class CentroidDotIndex(matrix: Array[Array[Double]]) {
  private val k = matrix.length
  private val dims = matrix.head.length
  private val flatThreshold = 128

  private def distSq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var d = 0
    while (d < dims) { val df = a(d) - b(d); s += df * df; d += 1 }
    s
  }

  // group structure (built only when k >= flatThreshold): reps, member
  // index lists, Euclidean radius per group — the CentroidL2Index
  // recipe (evenly spaced deterministic seeds, 3 Lloyd iterations)
  private val (reps, members, radii): (Array[Array[Double]], Array[Array[Int]], Array[Double]) =
    if (k < flatThreshold) (null, null, null)
    else {
      val g = math.min(256, math.ceil(math.sqrt(k.toDouble)).toInt)
      var rep = Array.tabulate(g)(j => matrix(((j.toLong * k) / g).toInt).clone())
      val assign = new Array[Int](k)
      var iter = 0
      while (iter < 3) {
        var i = 0
        while (i < k) {
          var bi = 0; var bd = Double.PositiveInfinity
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
          val sums = Array.ofDim[Double](g, dims)
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
            else Array.tabulate(dims)(d => sums(j)(d) / counts(j))
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
      val rad = nonEmpty
        .map(j => math.sqrt(byGroup(j).map(i => distSq(matrix(i), rep(j))).max))
        .toArray
      (r, m, rad)
    }

  def nearest(vec: Array[Double]): Int = {
    if (reps == null) return flatNearest(vec)
    var nx = 0.0
    var d = 0
    while (d < dims) { nx += vec(d) * vec(d); d += 1 }
    val normX = math.sqrt(nx)
    // conservative absolute slack: every dot/bound term is <= ~normX
    // (unit centroids), fold error <= dims·eps·normX ~ 1e-12·normX —
    // three orders of margin, and pruning only ever weakens
    val slack = 1e-9 * (normX + 1.0)
    val g = reps.length
    val ub = new Array[Double](g)
    var j = 0
    while (j < g) {
      val r = reps(j)
      var dot = 0.0
      var d2 = 0
      while (d2 < dims) { dot += vec(d2) * r(d2); d2 += 1 }
      ub(j) = dot + normX * radii(j)
      j += 1
    }
    // descending upper-bound order (g <= 256; insertion sort, no boxing)
    val order = Array.tabulate(g)(identity)
    var a = 1
    while (a < g) {
      val o = order(a); val key = ub(o)
      var b = a - 1
      while (b >= 0 && ub(order(b)) < key) { order(b + 1) = order(b); b -= 1 }
      order(b + 1) = o
      a += 1
    }
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var oi = 0
    while (oi < g) {
      val gi = order(oi)
      // NaN-safe prune direction: skip ONLY on a definite strict
      // bound; any NaN comparison falls through to the member scan
      if (!(ub(gi) + slack < best)) {
        val mem = members(gi)
        var mi = 0
        while (mi < mem.length) {
          val idx = mem(mi)
          val c = matrix(idx)
          var dot = 0.0
          var dd = 0
          while (dd < dims) { dot += vec(dd) * c(dd); dd += 1 }
          if (dot > best || (dot == best && idx < bestIdx)) {
            best = dot; bestIdx = idx
          }
          mi += 1
        }
      }
      oi += 1
    }
    bestIdx
  }

  private def flatNearest(vec: Array[Double]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < k) {
      val c = matrix(i)
      var dot = 0.0
      var d = 0
      while (d < dims) { dot += vec(d) * c(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = i }
      i += 1
    }
    best
  }
}
