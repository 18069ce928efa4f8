package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression serving TRAINED classifier weights: for
  * each token, `weights(pmod(xxhash64(token), weights.length))`, summed
  * over the array — the serving form of
  * [[graft.operators.QualityClassifier]] once a real model replaces the
  * deterministic LCG table ([[HashedLinearScore]]).
  *
  * The weight table rides inside the expression, so it ships to each
  * executor once per task closure (the broadcast-array shape; a 4096 x
  * 8-byte table is 32 KB) and per-row work is one hash + one array read
  * per token — no per-row literal array, no UDF, no shuffle.
  *
  * Corner semantics mirror [[HashedLinearScore]]: empty token array
  * sums to 0.0; a NULL token hashes as the bare seed 42; null input
  * array yields null.
  */
case class HashedWeightScore(child: Expression, weights: Seq[Double])
    extends UnaryExpression {
  require(weights.nonEmpty, "weights must be non-empty")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hashed_weight_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"hashed_weight_score requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val table: Array[Double] = weights.toArray

  override def nullSafeEval(input: Any): Any =
    scoreOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def scoreOf(arr: ArrayData): Double = {
    val w = table
    val buckets = w.length
    val n = arr.numElements()
    var sum = 0.0
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) 42L
        else XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
      sum += w((((h % buckets) + buckets) % buckets).toInt) // pmod
      j += 1
    }
    sum
  }

  /** Real whole-stage codegen (not CodegenFallback — the fallback trait
    * ejects the entire enclosing stage from whole-stage codegen). The
    * token loop stays one JVM method on a referenced expression object
    * (weight table included); the surrounding stage stays fused in
    * generated code.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("hashedWeightExpr", this, classOf[HashedWeightScore].getName)
    defineCodeGen(ctx, ev, c => s"$self.scoreOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWeightScore =
    copy(child = newChild)
}
