package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression folding an `array<long>` of token hashes
  * into the SimHash signature: bit i of the result is set when at
  * least half the hashes have bit i set.
  *
  * Replaces the interpreted two-`aggregate` formulation
  * ([[graft.operators.TextDedup]]'s bitCounts + sigFromCounts): per
  * token hash that built a `bits`-element array (one interpreted
  * `shiftright`+`bitwiseAND` lambda per bit) and zip_with-copied the
  * whole counter array — O(bits) allocations and ~2·bits boxed ops per
  * token. Here it is `bits` integer ops per token on one primitive
  * counter array.
  *
  * Bit-for-bit identical to the HOF form (NativeHashTwinsSpec),
  * including its corner semantics:
  *
  *   - EMPTY hash array -> every majority test reads 0 >= 0 -> ALL
  *     `bits` bits set;
  *   - any NULL element poisons every counter to null, and
  *     `when(null)` then contributes 0 per bit -> signature 0;
  *   - null input array -> null signature.
  */
case class SimHashFromHashes(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_from_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash_from_hashes requires array<long>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    signatureOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def signatureOf(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var j = 0
    while (j < n) {
      // HOF mimicry: one null hash nulls every counter, and the final
      // per-bit `when(null)` falls to otherwise(0) -> signature 0.
      // The check rides the counting loop (single pass — r18 ADVICE):
      // a null at ANY position zeroes the whole signature, so partial
      // counts accumulated before the null are simply discarded.
      if (arr.isNullAt(j)) return 0L
      val h = arr.getLong(j)
      var i = 0
      while (i < bits) {
        counts(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (2L * counts(i) >= n) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("simhashExpr", this, classOf[SimHashFromHashes].getName)
    defineCodeGen(ctx, ev, c => s"$self.signatureOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFromHashes =
    copy(child = newChild)
}
