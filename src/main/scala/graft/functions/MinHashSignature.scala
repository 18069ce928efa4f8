package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression computing a MinHash signature: element i
  * is the minimum over the input shingles of `xxhash64(i, shingle)`.
  *
  * Replaces the higher-order-function formulation for the production
  * (xxhash64) scheme — `aggregate` + `zip_with` + a `numHashes`-wide
  * `array(...)` are all interpreted, so every shingle paid lambda
  * dispatch plus a fresh 32-element array allocation. Here the loop is
  * `numHashes` fused hash/compare ops per shingle over two primitive
  * arrays — the form a 100 TB dedup scan needs. Bit-for-bit identical
  * to the HOF form (asserted by MinHashSignatureSpec), including its
  * corner semantics:
  *
  *   - empty shingle array -> all-`Long.MaxValue` signature (the
  *     `least` identity, exactly the HOF's `array_repeat` init);
  *   - a NULL shingle hashes as `xxhash64(i)` alone (Spark hash
  *     expressions skip null children, leaving the seed fold);
  *   - null input array -> null signature.
  *
  * The portable-md5 scheme keeps the HOF form — its whole point is
  * SQL-replayability in other engines, not speed.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_signature requires array<string>, got ${other.catalogString}")
  }

  /** Seed fold of `xxhash64(lit(i), shingle)`'s first child: hashing
    * the int i from Spark's default seed 42. Computed once per task.
    */
  @transient private lazy val seedHashes: Array[Long] =
    Array.tabulate(numHashes)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def nullSafeEval(input: Any): Any =
    signatureOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def signatureOf(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val acc = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        var i = 0
        while (i < numHashes) {
          if (seedHashes(i) < acc(i)) acc(i) = seedHashes(i)
          i += 1
        }
      } else {
        val s = arr.getUTF8String(j)
        var i = 0
        while (i < numHashes) {
          val h = XxHash64Function.hash(s, StringType, seedHashes(i))
          if (h < acc(i)) acc(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(acc)
  }

  /** Real whole-stage codegen (not CodegenFallback — the fallback trait
    * ejects the ENTIRE enclosing stage from whole-stage codegen, a
    * constant factor on exactly the hottest per-row loop of the dedup
    * scan). The signature loop stays one JVM method on a referenced
    * expression object — identical bytecode to the interpreted path —
    * while projections around it remain fused in the generated stage.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$self.signatureOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
