package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a custom
  * Catalyst `TypedImperativeAggregate`: a `depth x width` matrix of
  * counters; every value increments one counter per row (chosen by
  * that row's hash), and a frequency estimate is the MINIMUM of a
  * value's `depth` counters — never an underestimate, and over by at
  * most ~N/width per row with high probability. The heavy-hitter /
  * frequency summary for streams and shuffles too large to count
  * exactly ([[DeterministicSample]] is the membership sibling;
  * `approx_count_distinct` the cardinality one).
  *
  * Determinism contract: counter updates are pure sums over fixed
  * seeded xxhash64 rows, so partial buffers merge associatively
  * (elementwise add) and the final matrix — and therefore every
  * estimate — is a pure function of the data, independent of
  * partitioning, input order, or retries. Not SQL-replayable (no
  * engine-portable xxhash64), so the gated query emits exact counts
  * plus an in-plan estimate-vs-bound verdict (the q34 tolerance
  * pattern); [[estimate]] builds the probe from the SAME hash
  * expressions the aggregate used.
  *
  * Scale shape: per-group state is a fixed `depth*width` long array
  * (d=4, w=8192 -> 256 KB) regardless of input size; updates are
  * map-side combinable, the merge is one vector add per partial, and
  * probing is a stateless projection against the broadcast one-row
  * sketch. One corpus scan, constant memory — the whole point.
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  // The child is evaluated ONCE per row into a reusable one-field row;
  // the per-seed hash expressions rebind to that pre-evaluated value so
  // an expensive child costs one evaluation, not depth+1. Hash values
  // are identical to XxHash64-over-child (same type, same seed), which
  // [[CountMinSketch.estimate]]'s probe relies on.
  @transient private lazy val valueRow = new GenericInternalRow(1)
  @transient private lazy val hashExprs: Array[Expression] =
    Array.tabulate(depth)(i =>
      XxHash64(
        Seq(BoundReference(0, child.dataType, nullable = false)),
        CountMinSketch.seed(i)))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType =>
      TypeCheckResult.TypeCheckFailure(
        s"count_min_sketch requires an atomic input type, got ${child.dataType.catalogString}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      valueRow.update(0, v)
      var i = 0
      while (i < depth) {
        val h = hashExprs(i).eval(valueRow).asInstanceOf[Long]
        buf(i * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1L
        i += 1
      }
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
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "count_min_sketch_agg"
}

object CountMinSketch {

  /** Default geometry: 4 rows x 8192 counters = 256 KB of state,
    * overestimate <= ~10*N/8192 with probability 1 - 1e-4 per probe.
    */
  val DefaultDepth = 4
  val DefaultWidth = 8192

  /** Hash seed of sketch row `i` (functions.xxhash64's seed base). */
  def seed(i: Int): Long = 42L + i

  /** Aggregate column: the flattened depth x width counter matrix. */
  def sketch(c: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth): Column =
    GraftColumnShim.column(
      CountMinSketchAgg(GraftColumnShim.expression(c), depth, width).toAggregateExpression())

  /** Elementwise sum of two counter columns: the sketch of the
    * concatenation of the underlying streams — the aggregate's own
    * merge, in-plan, for persisted-store absorption
    * ([[graft.operators.SketchStore]]).
    */
  def merge(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x + y)

  /** In-plan frequency estimate of `value` against a sketch column:
    * the minimum of the value's `depth` counters, built from the SAME
    * seeded hash expressions the aggregate updates with. Stateless —
    * probes ride any projection over the (broadcast) one-row sketch.
    */
  def estimate(
      sketchCol: Column,
      value: Column,
      depth: Int = DefaultDepth,
      width: Int = DefaultWidth): Column =
    least((0 until depth).map { i =>
      val h = GraftColumnShim.column(
        XxHash64(Seq(GraftColumnShim.expression(value)), seed(i)))
      element_at(sketchCol, (lit(i.toLong * width) + pmod(h, lit(width.toLong))).cast("int") + 1)
    }: _*)

  /** Sketch inner product — the classic count-min JOIN-SIZE estimator
    * (Cormode & Muthukrishnan §4.2): `min over rows of Σ_j a[i][j]·b[i][j]`
    * upper-bounds `Σ_k c_a(k)·c_b(k)`, the exact equi-join cardinality,
    * and is within `N_a·N_b/width` of it in expectation per row.
    * Self-product (`a`, `a`) estimates a self-join's size — the
    * skew-explosion early warning for a planned shuffle.
    *
    * HOF evaluation is deliberate: this runs on ALREADY-AGGREGATED
    * one-row sketch columns, so interpretation cost is a few thousand
    * multiplies once per query, not per input row.
    */
  def innerProductEstimate(
      a: Column,
      b: Column,
      depth: Int = DefaultDepth,
      width: Int = DefaultWidth): Column =
    least((0 until depth).map { i =>
      aggregate(
        zip_with(
          slice(a, i * width + 1, width),
          slice(b, i * width + 1, width),
          (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    }: _*)
}
