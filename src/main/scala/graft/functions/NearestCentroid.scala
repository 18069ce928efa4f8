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
    var best = 0
    var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < normalized.length) {
      val c = normalized(i)
      var dot = 0.0
      var d = 0
      while (d < dims) { dot += vec(d) * c(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = i }
      i += 1
    }
    best
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
