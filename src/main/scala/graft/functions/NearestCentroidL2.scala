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
    var best = 0
    var bestDist = Long.MaxValue
    var i = 0
    while (i < matrix.length) {
      val c = matrix(i)
      var dist = 0L
      var d = 0
      while (d < dims) { val df = vec(d) - c(d); dist += df * df; d += 1 }
      if (dist < bestDist) { bestDist = dist; best = i }
      i += 1
    }
    best
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
