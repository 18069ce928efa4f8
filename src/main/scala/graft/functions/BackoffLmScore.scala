package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression scoring a token array under a collected
  * stupid-backoff trigram model ([[graft.operators.BackoffLm]]) in one
  * pass — the stateless serving twin of the distributed join form, and
  * what lets the score gate an UNAGGREGATED document stream (no
  * explode, no join, no per-doc state). Same closure-shipped-model
  * design as [[BigramLmScore]]; the join form remains the shape for
  * models too large to collect.
  *
  * Bit-parity contract with the join form (proven by differential
  * spec): identical double expression trees per branch —
  * `c3/c2ctx`, `0.4 * (c2/c1ctx)`, `(0.4*0.4) * (max(c1,1)/N)` (the
  * α·α product pre-folded exactly as Catalyst's constant folding does)
  * — then `floor(StrictMath.log(s) * 1e6)` micro-nats summed as longs
  * and the HALF_UP round(4) Catalyst's Round applies.
  *
  * Returns a struct (n_tokens, n_tri, n_big, n_uni, avg_logs); an
  * empty token array scores (0, 0, 0, 0, null), a null array null.
  */
case class BackoffLmScore(
    child: Expression,
    trigrams: Map[(String, String, String), Long],
    bigrams: Map[(String, String), Long],
    unigrams: Map[String, Long],
    totalTokens: Long)
    extends UnaryExpression {
  require(totalTokens > 0, "totalTokens must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_tri", LongType, nullable = false),
    StructField("n_big", LongType, nullable = false),
    StructField("n_uni", LongType, nullable = false),
    StructField("avg_logs", DoubleType, nullable = true)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "backoff_lm_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"backoff_lm_score requires array<string>, got ${other.catalogString}")
  }

  // nested java maps: one hash lookup per level, no tuple boxing per probe
  @transient private lazy val triTable: java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]]()
    trigrams.foreach { case ((w2, w1, w), c) =>
      m.computeIfAbsent(w2 + " " + w1, _ => new java.util.HashMap[String, java.lang.Long]()).put(w, java.lang.Long.valueOf(c))
    }
    m
  }
  @transient private lazy val bigTable: java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]]()
    bigrams.foreach { case ((w1, w), c) =>
      m.computeIfAbsent(w1, _ => new java.util.HashMap[String, java.lang.Long]()).put(w, java.lang.Long.valueOf(c))
    }
    m
  }
  @transient private lazy val uniTable: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    unigrams.foreach { case (w, c) => m.put(w, java.lang.Long.valueOf(c)) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    scoreOf(input.asInstanceOf[ArrayData])

  /** public: called from generated code via an expression reference */
  def scoreOf(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return InternalRow(0L, 0L, 0L, 0L, null)
    val aa = BackoffLmScore.Alpha * BackoffLmScore.Alpha
    var sum = 0L
    var nTri = 0L; var nBig = 0L; var nUni = 0L
    var i = 0
    while (i < n) {
      val w = tokenAt(arr, i)
      val w1 = if (i >= 1) tokenAt(arr, i - 1) else null
      val w2 = if (i >= 2) tokenAt(arr, i - 2) else null
      var s = 0.0
      val c3 = if (w2 != null) lookup2(triTable, w2 + " " + w1, w) else null
      if (c3 != null) {
        val c2ctx = lookup2(bigTable, w2, w1)
        s = c3.longValue().toDouble / c2ctx.longValue().toDouble
        nTri += 1L
      } else {
        val c2 = if (w1 != null) lookup2(bigTable, w1, w) else null
        if (c2 != null) {
          val c1ctx = uniTable.get(w1)
          val sBig = c2.longValue().toDouble / c1ctx.longValue().toDouble
          s = if (w2 != null) BackoffLmScore.Alpha * sBig else sBig
          nBig += 1L
        } else {
          val c1 = uniTable.get(w)
          val base = (if (c1 == null || c1.longValue() < 1L) 1L else c1.longValue()).toDouble /
            totalTokens.toDouble
          s = if (w2 != null) aa * base
          else if (w1 != null) BackoffLmScore.Alpha * base
          else base
          nUni += 1L
        }
      }
      sum += StrictMath.floor(StrictMath.log(s) * BackoffLmScore.LogProbScale).toLong
      i += 1
    }
    val avgRaw = sum.toDouble / BackoffLmScore.LogProbScale / n.toDouble
    InternalRow(n.toLong, nTri, nBig, nUni, round4(avgRaw))
  }

  private def lookup2(
      t: java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]],
      k1: String, k2: String): java.lang.Long = {
    val inner = t.get(k1)
    if (inner == null) null
    else inner.get(k2).asInstanceOf[java.lang.Long]
  }

  private def tokenAt(arr: ArrayData, i: Int): String =
    if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString

  /** Catalyst Round(_, 4) on a double: scala BigDecimal HALF_UP. */
  private def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Real whole-stage codegen — one call on a referenced object. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("backoffLmExpr", this, classOf[BackoffLmScore].getName)
    defineCodeGen(ctx, ev, c => s"$self.scoreOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BackoffLmScore =
    copy(child = newChild)
}

object BackoffLmScore {
  /** Same constants as [[graft.operators.BackoffLm]] (duplicated so
    * the expression has no operator dependency).
    */
  val LogProbScale: Double = 1e6
  val Alpha: Double = 0.4
}
