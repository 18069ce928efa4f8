package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression scoring a token array against a TRAINED
  * bigram LM ([[graft.operators.NgramLm]]) in one pass — the stateless
  * serving form of the perplexity quality signal, which is what lets
  * the gate run on an UNAGGREGATED document stream (no explode, no
  * join, no per-doc groupBy — so no streaming state at all).
  *
  * The model (bigram counts, context counts, vocab size) rides inside
  * the expression the way [[HashedWeightScore]]'s weight table does:
  * shipped once per task closure, two hash lookups per position. The
  * distributed join form in NgramLm.perplexity stays the right shape
  * for UNBOUNDED models; this expression is the bounded-model fast
  * path, and the two are proven equal on every doc by differential
  * spec (StreamPerplexitySpec).
  *
  * Bit-parity contract with the batch pipeline: per position
  * `floor(StrictMath.log((c+1)/(c_ctx+V)) * 1e6).toLong` — Spark's
  * `log`/`exp` ARE StrictMath (verified against the 4.1.2 bytecode),
  * the probability is the same IEEE rational, and the quantized longs
  * sum exactly in any order; avg/perplexity apply the same HALF_UP
  * round(4) Catalyst's Round uses.
  *
  * Returns a struct (n_bigrams, avg_logp, perplexity); under 2 tokens
  * scores (0, null, null), a null token array scores null.
  */
case class BigramLmScore(
    child: Expression,
    bigrams: Map[(String, String), Long],
    contexts: Map[String, Long],
    vocabSize: Long)
    extends UnaryExpression {
  require(vocabSize > 0, "vocabSize must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("avg_logp", DoubleType, nullable = true),
    StructField("perplexity", DoubleType, nullable = true)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bigram_lm_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bigram_lm_score requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val bigramTable: java.util.HashMap[String, java.util.HashMap[String, Long]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Long]]()
    bigrams.foreach { case ((ctx, w), c) =>
      m.computeIfAbsent(ctx, _ => new java.util.HashMap[String, Long]()).put(w, c)
    }
    m
  }
  @transient private lazy val contextTable: java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long]()
    contexts.foreach { case (ctx, c) => m.put(ctx, c) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    scoreOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def scoreOf(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n < 2) return InternalRow(0L, null, null)
    var sum = 0L
    var prev = tokenAt(arr, 0)
    var j = 1
    while (j < n) {
      val cur = tokenAt(arr, j)
      val perW = bigramTable.get(prev)
      val cBi: Long = if (perW == null) 0L else {
        val c = perW.get(cur)
        if (c == null) 0L else c.longValue()
      }
      val cCtxBoxed = contextTable.get(prev)
      val cCtx: Long = if (cCtxBoxed == null) 0L else cCtxBoxed.longValue()
      val p = (cBi + 1L).toDouble / (cCtx + vocabSize).toDouble
      sum += StrictMath.floor(StrictMath.log(p) * BigramLmScore.LogProbScale).toLong
      prev = cur
      j += 1
    }
    val cnt = (n - 1).toLong
    val avgRaw = sum.toDouble / BigramLmScore.LogProbScale / cnt.toDouble
    InternalRow(cnt, round4(avgRaw), round4(StrictMath.exp(-avgRaw)))
  }

  private def tokenAt(arr: ArrayData, i: Int): String =
    if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString

  /** Catalyst Round(_, 4) on a double: scala BigDecimal HALF_UP. */
  private def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Real whole-stage codegen — one method call on a referenced
    * expression object (model tables included); the enclosing stage
    * stays fused.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("bigramLmExpr", this, classOf[BigramLmScore].getName)
    defineCodeGen(ctx, ev, c => s"$self.scoreOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramLmScore =
    copy(child = newChild)
}

object BigramLmScore {
  /** Same quantization as [[graft.operators.NgramLm.LogProbScale]]
    * (duplicated as a plain constant so the expression has no operator
    * dependency).
    */
  val LogProbScale: Double = 1e6
}
