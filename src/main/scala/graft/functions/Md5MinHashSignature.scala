package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the PORTABLE (md5-hex) MinHash
  * signature: element i is the minimum over the input shingles of
  * `md5("{i}:" + shingle)` as a lowercase hex string, minimum under
  * plain string ordering — exactly
  * [[graft.operators.TextDedup.PortableMd5Scheme]]'s semantics, which
  * the DuckDB oracle replays in SQL.
  *
  * The HOF formulation (`aggregate` + `zip_with` + a fresh
  * `numHashes`-wide string array per shingle) is interpreted: every
  * (shingle, seed) paid a UTF8String concat, a hex-string allocation,
  * lambda dispatch, and a 32-element array copy — measured as the
  * dominant cold cost of every md5-scheme candidate stage (the whole
  * oracle-gated dedup family). Here the loop works on raw digests:
  *
  *   - lowercase hex strings of equal length order EXACTLY like their
  *     16 digest bytes compared as unsigned — so the inner loop
  *     compares bytes and hex-encodes only the numHashes winners once
  *     per row;
  *   - one ThreadLocal MessageDigest serves the whole task (Spark's
  *     own `md5()` constructs one per call via commons-codec);
  *   - the seed prefixes ("0:", "1:", ...) are UTF-8 byte arrays
  *     computed once per expression instance.
  *
  * Bit-for-bit identical to the HOF form (asserted by
  * Md5MinHashSignatureSpec), including its corner semantics:
  *
  *   - empty shingle array -> all-"g" signature (the `least` identity
  *     of the scheme, exactly the HOF's `array_repeat` init);
  *   - a NULL shingle contributes nothing (concat -> null, md5 -> null,
  *     `least(acc, null)` keeps acc);
  *   - null input array -> null signature.
  */
case class Md5MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"md5_minhash_signature requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"$i:".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any =
    signatureOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def signatureOf(arr: ArrayData): ArrayData = {
    val md = Md5MinHashSignature.digest.get()
    val n = arr.numElements()
    // numHashes running minimum digests; a null row means "still at the
    // 'g' identity" (every real md5 hex sorts below "g")
    val mins = new Array[Array[Byte]](numHashes)
    val cur = new Array[Byte](16)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val shingle = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(seedPrefixes(i))
          md.update(shingle)
          md.digest(cur, 0, 16)
          if (mins(i) == null || Md5MinHashSignature.ltUnsigned(cur, mins(i))) {
            if (mins(i) == null) mins(i) = new Array[Byte](16)
            System.arraycopy(cur, 0, mins(i), 0, 16)
          }
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[AnyRef](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) =
        if (mins(i) == null) Md5MinHashSignature.Identity
        else UTF8String.fromBytes(Md5MinHashSignature.hex(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Real whole-stage codegen (not CodegenFallback) — same rationale as
    * [[MinHashSignature]]: the loop stays one JVM method on a
    * referenced expression object while the projections around it stay
    * fused in the generated stage.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("md5MinhashExpr", this, classOf[Md5MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$self.signatureOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSignature =
    copy(child = newChild)
}

object Md5MinHashSignature {
  /** The scheme's `least` identity: 'g' sorts after every hex digit. */
  private val Identity = UTF8String.fromString("g")

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Unsigned lexicographic compare of two 16-byte digests — the same
    * order as comparing their lowercase-hex strings (hex is monotone
    * in the byte value, and equal lengths make it pure lexicographic).
    */
  private def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".getBytes("US-ASCII")

  private def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val v = d(i) & 0xff
      out(2 * i) = HexChars(v >>> 4)
      out(2 * i + 1) = HexChars(v & 0x0f)
      i += 1
    }
    out
  }
}
