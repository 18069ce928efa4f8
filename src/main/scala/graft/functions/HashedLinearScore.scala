package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression computing the hashed-bag-of-words linear
  * feature sum: for each token, `((pmod(xxhash64(token), buckets) * a
  * + c) mod m`, summed over the array.
  *
  * Replaces the higher-order-function formulation for the production
  * (xxhash64) scheme — `transform` + `aggregate` are interpreted, so
  * every token paid two lambda dispatches and a boxed Long; here it is
  * one fused hash/multiply/mod per token in a primitive loop — the
  * form a full-corpus quality scan needs. Bit-for-bit identical to the
  * HOF form (asserted by QualityClassifierSpec), including its corner
  * semantics:
  *
  *   - empty token array -> sum 0;
  *   - a NULL token hashes as the bare seed 42 (Spark hash expressions
  *     skip null children);
  *   - null input array -> null.
  *
  * The portable-md5 scheme keeps the HOF form — its whole point is
  * SQL-replayability in other engines, not speed.
  */
case class HashedLinearScore(
    child: Expression,
    numBuckets: Int,
    a: Long,
    c: Long,
    m: Long)
    extends UnaryExpression {
  require(numBuckets > 0 && m > 0, "numBuckets and m must be positive")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hashed_linear_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"hashed_linear_score requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    scoreOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def scoreOf(arr: ArrayData): Long = {
    val n = arr.numElements()
    var sum = 0L
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) 42L
        else XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
      val bucket = ((h % numBuckets) + numBuckets) % numBuckets // pmod
      sum += (bucket * a + c) % m
      j += 1
    }
    sum
  }

  /** Real whole-stage codegen (not CodegenFallback — the fallback trait
    * ejects the entire enclosing stage from whole-stage codegen). The
    * token loop stays one JVM method on a referenced expression object;
    * the surrounding stage stays fused in generated code.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("hashedLinearExpr", this, classOf[HashedLinearScore].getName)
    defineCodeGen(ctx, ev, c => s"$self.scoreOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}
