package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) as a custom
  * Catalyst `TypedImperativeAggregate`: `m = 2^p` byte registers, each
  * holding the maximum observed "rank" (leading-zero run + 1) of the
  * hash suffix of values routed to it by the hash prefix. The
  * mergeable distinct-count summary — [[CountMinSketchAgg]] answers
  * "how often", this answers "how many different" — for cardinalities
  * where exact `count(distinct ...)` would shuffle every distinct
  * value (Spark's own `approx_count_distinct` is the built-in twin;
  * this one exposes the REGISTERS, so sketches persist, absorb
  * increments, and union across groups/partitions/time windows).
  *
  * Determinism contract: register updates are max-folds over a fixed
  * seeded xxhash64, so partial buffers merge associatively and
  * commutatively (elementwise max) and the final register array — and
  * therefore the estimate — is a pure function of the data set,
  * independent of partitioning, input order, retries, or grouping
  * topology (HllSketchSpec proves union-of-group-sketches ==
  * whole-corpus sketch register for register). Not SQL-replayable (no
  * engine-portable xxhash64), so the gated query emits exact distinct
  * counts plus an in-plan estimate-relative-error verdict (the q34
  * tolerance pattern); [[HyperLogLog.estimate]] computes the estimate
  * from the register column in-plan.
  *
  * Scale shape: per-group state is a fixed `2^p` bytes (p=10 -> 1 KB)
  * regardless of input size; updates are map-side combinable, the
  * merge is one vector max per partial. At p=10 the standard error is
  * 1.04/sqrt(1024) ~ 3.3%.
  */
case class HyperLogLogAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 18, "p must be in [4, 18]")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType =>
      TypeCheckResult.TypeCheckFailure(
        s"hll_sketch requires an atomic input type, got ${child.dataType.catalogString}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, HyperLogLog.Seed)
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      // rank: 1-based leading-zero run of the suffix; an all-zero
      // suffix saturates at 64 - p + 1 (the max information the
      // suffix carries)
      val rank = if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLogAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLogAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HyperLogLogAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "hll_sketch_agg"
}

object HyperLogLog {

  /** Default precision: 1024 one-byte registers, ~3.3% standard error. */
  val DefaultP = 10

  /** xxhash64 seed (functions.xxhash64's default base). */
  val Seed = 42L

  /** Aggregate column: the `2^p` HLL registers (`array<int>`). */
  def sketch(c: Column, p: Int = DefaultP): Column =
    GraftColumnShim.column(
      HyperLogLogAgg(GraftColumnShim.expression(c), p).toAggregateExpression())

  /** Bias-corrected cardinality estimate from a register column
    * (stateless; HOF arithmetic is fine here — it runs once per
    * sketch row, not per corpus row): the harmonic-mean raw estimate
    * `alpha_m * m^2 / sum(2^-reg)` with the small-range
    * linear-counting correction (`m * ln(m / zeroRegisters)` when the
    * raw estimate is below 2.5m and empty registers remain).
    */
  def estimate(regs: Column, p: Int = DefaultP): Column = {
    val m = (1 << p).toDouble
    val alpha =
      if (m <= 16) 0.673
      else if (m <= 32) 0.697
      else if (m <= 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val sumInv = aggregate(
      regs, lit(0.0), (acc, r) => acc + pow(lit(2.0), -r.cast("double")))
    val zeros = size(filter(regs, r => r === 0))
    val raw = lit(alpha * m * m) / sumInv
    when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m) * log(lit(m) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** Elementwise union (max) of two register columns: the sketch of
    * the union of the underlying data sets — the property that lets
    * per-partition / per-day / per-group sketches roll up without
    * rescanning anything.
    */
  def union(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => greatest(x, y))

  /** Inclusion-exclusion intersection estimate,
    * `|A ∩ B| ~ est(A) + est(B) - est(A ∪ B)` — cross-corpus overlap
    * (shared vocabulary, shared URLs, contamination surface area)
    * WITHOUT joining the corpora: three register reads off sketches
    * each side already maintains. Relative error grows as the true
    * intersection shrinks versus the unions (the subtraction
    * amplifies); gate use to overlaps that are a material fraction of
    * either side, or bound with the 3-sigma union error.
    */
  def intersectionEstimate(a: Column, b: Column, p: Int = DefaultP): Column =
    estimate(a, p) + estimate(b, p) - estimate(union(a, b), p)
}
