package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring, UnsafeProjection, UnsafeRow, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Custom Catalyst aggregate (`TypedImperativeAggregate`): the `k`
  * input values with the smallest `xxhash64` — a deterministic,
  * mergeable reservoir ("bottom-k by hash" / KMV-style sample).
  *
  * Unlike an RNG reservoir, the result is a pure function of the data:
  * partial buffers merge associatively (keep the union's k smallest
  * hashes), so partial aggregation works and re-runs/retries agree —
  * and the same sample definition is computable elsewhere
  * ([[graft.operators.Sampling.samplePerGroup]] with the default hash
  * produces the identical set, which the tests assert).
  *
  * Buffer is bounded at k entries regardless of input size; per-group
  * state is O(k).
  *
  * `portableRank = true` ranks by a 60-bit hash from the first 15 md5
  * hex chars of the value's string form instead of xxhash64 — bit-
  * identical in any engine with md5, so the selected sample is
  * SQL-replayable (`row_number() OVER (... ORDER BY ('0x' ||
  * substr(md5(v::varchar),1,15))::BIGINT) <= k` in DuckDB); that is
  * how `sample_sketch` is oracle-gated. Default stays xxhash64 (one
  * hash per row beats md5 + hex decode on the 100 TB path).
  */
case class DeterministicSample(
    child: Expression,
    k: Int,
    portableRank: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DeterministicSample.Buffer] {

  require(k > 0, "k must be positive")

  @transient private lazy val hashExpr: Expression =
    if (portableRank)
      Cast(Conv(Substring(Md5(Cast(Cast(child, StringType), BinaryType)), Literal(1), Literal(15)),
        Literal(16), Literal(10)), LongType)
    else XxHash64(Seq(child), 42L) // functions.xxhash64's seed
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType =>
      TypeCheckResult.TypeCheckFailure(
        s"deterministic_sample requires an atomic input type, got ${child.dataType.catalogString}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): DeterministicSample.Buffer =
    new DeterministicSample.Buffer(k)

  override def update(buf: DeterministicSample.Buffer, input: InternalRow): DeterministicSample.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val h = hashExpr.eval(input).asInstanceOf[Long]
      buf.add(h, copyValue(v))
    }
    buf
  }

  override def merge(buf: DeterministicSample.Buffer, other: DeterministicSample.Buffer): DeterministicSample.Buffer = {
    other.entries.foreach { case (h, v) => buf.add(h, v) }
    buf
  }

  override def eval(buf: DeterministicSample.Buffer): Any =
    new GenericArrayData(buf.entries.sortBy(_._1).map(_._2))

  override def serialize(buf: DeterministicSample.Buffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    val entries = buf.entries
    out.writeInt(entries.length)
    entries.foreach { case (h, v) =>
      out.writeLong(h)
      val row = proj(InternalRow(v))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DeterministicSample.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new DeterministicSample.Buffer(k)
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val h = in.readLong()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buf.add(h, copyValue(row.get(0, child.dataType)))
    }
    buf
  }

  private def copyValue(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case b: Array[Byte] => b.clone()
    case x => x
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DeterministicSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DeterministicSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DeterministicSample =
    copy(child = newChildren.head)

  override def prettyName: String = "deterministic_sample"
}

object DeterministicSample {

  /** Bounded "keep the k smallest hashes" buffer (max-heap by hash). */
  final class Buffer(k: Int) {
    private val heap = mutable.PriorityQueue.empty[(Long, Any)](Ordering.by(_._1))
    private val seen = mutable.HashSet.empty[Long] // drop duplicate hashes (same value)

    def add(hash: Long, value: Any): Unit =
      if (!seen.contains(hash)) {
        if (heap.size < k) { heap.enqueue((hash, value)); seen += hash }
        else if (hash < heap.head._1) {
          seen -= heap.dequeue()._1
          heap.enqueue((hash, value))
          seen += hash
        }
      }

    def entries: Seq[(Long, Any)] = heap.toSeq
  }

  /** Column API: `deterministic_sample(col, k)`. */
  def apply(c: Column, k: Int): Column =
    GraftColumnShim.column(
      DeterministicSample(GraftColumnShim.expression(c), k).toAggregateExpression())

  /** Column API with an explicit rank hash family (see class doc). */
  def apply(c: Column, k: Int, portableRank: Boolean): Column =
    GraftColumnShim.column(
      DeterministicSample(GraftColumnShim.expression(c), k, portableRank).toAggregateExpression())
}
