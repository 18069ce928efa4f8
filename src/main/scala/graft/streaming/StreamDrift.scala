package graft.streaming

import graft.functions.TextFunctions
import graft.operators.CorpusDrift

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming corpus drift — the in-flight form of
  * [[graft.operators.CorpusDrift]]: per event-time window, the token
  * distribution of the window's documents is compared against a STATIC
  * reference distribution (yesterday's corpus, the accepted baseline),
  * emitting the window's top drift movers and scalar KL once the
  * watermark closes the window.
  *
  * Shape: a custom-state operator (`flatMapGroupsWithState` keyed by
  * window start) accumulates one token-count map per open window —
  * the SAME O(distinct tokens) cardinality any drift computation must
  * hold somewhere — and on event-time timeout computes contributions
  * over the union vocabulary exactly as the batch operator does
  * (identical smoothing, StrictMath log, 1e-12 floor quantization,
  * identical mover ordering), so stream == batch doc-for-doc on the
  * same window (StreamDriftSpec differential). The reference rides the
  * task closure via a bounded collect ([[collectReference]] refuses
  * past `maxRows`), the [[graft.functions.BigramLmScore]] serving
  * argument.
  *
  * Tokenization happens in Spark SQL (TextFunctions.tokens) BEFORE the
  * state function, so stream and batch tokenize with the same
  * expression — no JVM-vs-Catalyst lowercase/split drift.
  */
object StreamDrift {

  /** A driver-collected reference distribution (bounded by
    * construction).
    */
  final case class Reference(counts: Map[String, Long], total: Long)

  final case class DriftRow(
      window_start: Timestamp,
      window_end: Timestamp,
      token: String,
      c_w: Long,
      c_ref: Long,
      kl_contrib: Double,
      kl_window: Double)

  /** Collect a reference corpus' token counts for closure shipping;
    * refuses above `maxRows` distinct tokens (a reference past that
    * should drive the batch operator instead).
    */
  def collectReference(refCorpus: DataFrame, textCol: String, maxRows: Long = 2000000L): Reference = {
    val counts = refCorpus
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val n = counts.count()
    require(n <= maxRows,
      s"reference has $n distinct tokens > $maxRows; use the batch CorpusDrift operator")
    val m = counts.collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("c")).toMap
    Reference(m, m.valuesIterator.sum)
  }

  /** Windowed top-k drift movers (plus the window's scalar KL on every
    * row) over a document stream.
    *
    * @param docs streaming DataFrame carrying (tsCol, textCol)
    * @param windowMs tumbling window length in millis
    * @param watermark max lateness, e.g. "2 minutes"
    * @param k movers per window
    */
  def windowedTopMovers(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      reference: Reference,
      windowMs: Long,
      watermark: String,
      k: Int): Dataset[DriftRow] = {
    require(windowMs > 0 && k > 0, "windowMs and k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.kryo[scala.collection.mutable.HashMap[String, Long]]
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("ts"), TextFunctions.tokens(col(textCol)).as("toks"))
      .as[(Timestamp, Seq[String])]
      .groupByKey { case (ts, _) => Math.floorDiv(ts.getTime, windowMs) * windowMs }(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (winStart: Long, batch: Iterator[(Timestamp, Seq[String])],
         state: GroupState[scala.collection.mutable.HashMap[String, Long]]) => {
          if (batch.isEmpty && state.hasTimedOut) {
            val counts = state.get
            state.remove()
            emitWindow(winStart, windowMs, counts, reference, k)
          } else {
            val counts = state.getOption.getOrElse(new scala.collection.mutable.HashMap[String, Long]())
            batch.foreach { case (_, toks) =>
              toks.foreach(t => counts.update(t, counts.getOrElse(t, 0L) + 1L))
            }
            state.update(counts)
            state.setTimeoutTimestamp(winStart + windowMs)
            Iterator.empty
          }
        })
  }

  /** Batch-identical drift math over one closed window: union-vocab
    * smoothing, StrictMath log, 1e-12 floor quantization, |lp| desc /
    * token asc mover order, HALF_UP rounding — every step mirrors
    * [[graft.operators.CorpusDrift]] so the differential holds
    * bit-for-bit.
    */
  private def emitWindow(
      winStart: Long,
      windowMs: Long,
      counts: scala.collection.Map[String, Long],
      ref: Reference,
      k: Int): Iterator[DriftRow] = {
    val union = counts.keySet ++ ref.counts.keySet
    val v = union.size.toLong
    val nA = counts.valuesIterator.sum
    val nB = ref.total
    val contribs = union.iterator.map { t =>
      val cA = counts.getOrElse(t, 0L)
      val cB = ref.counts.getOrElse(t, 0L)
      val pA = (cA + 1L).toDouble / (nA + v).toDouble
      val pB = (cB + 1L).toDouble / (nB + v).toDouble
      (t, cA, cB,
        StrictMath.floor(pA * StrictMath.log(pA / pB) * CorpusDrift.ContribScale).toLong)
    }.toVector
    val klWindow = round6(contribs.iterator.map(_._4).sum.toDouble / CorpusDrift.ContribScale)
    val start = new Timestamp(winStart)
    val end = new Timestamp(winStart + windowMs)
    contribs
      .sortBy { case (t, _, _, lp) => (-math.abs(lp), t) }
      .take(k)
      .iterator
      .map { case (t, cA, cB, lp) =>
        DriftRow(start, end, t, cA, cB,
          round6(lp.toDouble / CorpusDrift.ContribScale), klWindow)
      }
  }

  /** Catalyst Round(_, 6) on a double: scala BigDecimal HALF_UP. */
  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
