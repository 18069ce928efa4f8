package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-range equi-width histogram as a custom Catalyst
  * `TypedImperativeAggregate` — the quantile member of the sketch
  * quartet ([[CountMinSketchAgg]] frequency, [[HyperLogLogAgg]]
  * cardinality, [[BloomFilterAgg]] membership, this one
  * distribution): `numBuckets` counters over [lo, hi) plus underflow/
  * overflow, so any quantile of a bounded metric (doc length, token
  * count, score) reads off the counters with error <= one bucket
  * width in VALUE and zero error in bucket-rank.
  *
  * Why not GK/KLL/t-digest: those trade the fixed range for
  * adaptivity, but their compactions depend on arrival order (KLL
  * coin flips, t-digest centroid drift) — a stream retry or a
  * different partitioning yields a different summary. An equi-width
  * histogram over a KNOWN range (pipeline metrics have one) is the
  * deterministic alternative: counter updates are pure sums, partials
  * merge by vector add (associative/commutative), and the final
  * counters — hence every quantile read — are a pure function of the
  * data multiset. That buys exact stream==batch differentials and
  * cross-engine verdicts the order-sensitive sketches cannot give.
  *
  * Scale shape: per-group state is `numBuckets + 2` longs (256
  * buckets -> ~2 KB) regardless of input size; updates are map-side
  * combinable; quantile reads are a stateless fold over the one-row
  * counter array.
  */
case class HistogramSketchAgg(
    child: Expression,
    numBuckets: Int,
    lo: Double,
    hi: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBuckets > 0, "numBuckets must be positive")
  require(hi > lo, "hi must exceed lo")
  private val width = (hi - lo) / numBuckets

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"histogram_sketch requires a numeric input, got ${other.catalogString}")
  }

  /** layout: [underflow, bucket_0 .. bucket_{n-1}, overflow] */
  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBuckets + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].doubleValue()
      val idx =
        if (x < lo) 0
        else if (x >= hi) numBuckets + 1
        else 1 + math.min(((x - lo) / width).toInt, numBuckets - 1)
      buf(idx) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bytes.putLong)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numBuckets + 2)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistogramSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "histogram_sketch_agg"
}

object HistogramSketch {

  /** Aggregate column: `[underflow, b_0..b_{n-1}, overflow]` counters. */
  def sketch(c: Column, numBuckets: Int, lo: Double, hi: Double): Column =
    GraftColumnShim.column(
      HistogramSketchAgg(GraftColumnShim.expression(c), numBuckets, lo, hi)
        .toAggregateExpression())

  /** Elementwise sum of two counter columns (the aggregate's own
    * merge, in-plan — see [[graft.operators.SketchStore]]).
    */
  def merge(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x + y)

  /** Quantile read from a counter column (stateless fold — runs once
    * per sketch row): the MIDPOINT of the bucket holding the
    * `ceil(q * total)`-th ranked value. Underflow clamps to `lo`,
    * overflow to `hi`. Value error <= half a bucket width when the
    * mass is in range; rank error zero by construction.
    */
  def quantile(counts: Column, q: Double, numBuckets: Int, lo: Double, hi: Double): Column = {
    require(q > 0.0 && q <= 1.0, "q must be in (0, 1]")
    val width = (hi - lo) / numBuckets
    val total = aggregate(counts, lit(0L), (acc, c) => acc + c)
    val target = ceil(lit(q) * total.cast("double")).cast("long")
    // fold to struct(cum, idx): first index whose cumulative count
    // reaches the target rank
    val indexed = zip_with(
      counts,
      sequence(lit(0), lit(numBuckets + 1)),
      (c, i) => struct(c.as("c"), i.as("i")))
    val found = aggregate(
      indexed,
      struct(lit(0L).as("cum"), lit(-1).as("idx")),
      (acc, x) => struct(
        (acc.getField("cum") + x.getField("c")).as("cum"),
        when(acc.getField("idx") >= 0, acc.getField("idx"))
          .otherwise(
            when(acc.getField("cum") + x.getField("c") >= target, x.getField("i"))
              .otherwise(lit(-1)))
          .as("idx")))
    val idx = found.getField("idx")
    when(idx <= 0, lit(lo))
      .when(idx >= numBuckets + 1, lit(hi))
      .otherwise(lit(lo) + lit(width) * (idx.cast("double") - lit(1.0) + lit(0.5)))
  }
}
