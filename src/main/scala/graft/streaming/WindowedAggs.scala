package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed streaming aggregations (beyond the reference's
  * surface, which handles lateness transactionally and needs no
  * watermarks — SURVEY §2.8 T6; these are the standard streaming
  * analytics the engine offers as first-class ops).
  *
  * State scale note: with watermark + append mode, Spark bounds state
  * to windows newer than (max event time - watermark); state size is
  * O(active windows x groups), independent of stream length.
  */
object WindowedAggs {

  /** Tumbling-window counts/sums per group with a watermark.
    *
    * @param df streaming DataFrame with an event-time column
    * @param tsCol event-time column (TimestampType)
    * @param groupCols grouping columns beside the window
    * @param windowDuration e.g. "5 minutes"
    * @param watermark max lateness, e.g. "10 minutes"
    * @param valueCol numeric column to sum (in addition to count)
    */
  def tumblingCounts(
      df: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      windowDuration: String,
      watermark: String,
      valueCol: Option[String] = None): DataFrame = {
    val grouped = df
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration) +: groupCols.map(col): _*)
    val base = valueCol match {
      case Some(v) => grouped.agg(count(lit(1)).as("n"), sum(col(v)).as("total"))
      case None => grouped.agg(count(lit(1)).as("n"))
    }
    val outCols = Seq(col("window.start").as("window_start"), col("window.end").as("window_end")) ++
      groupCols.map(col) ++
      base.columns.filterNot(c => c == "window" || groupCols.contains(c)).map(col)
    base.select(outCols: _*)
  }

  /** Per-window count-min sketch: the bounded-state streaming
    * frequency summary. State per window is the fixed depth*width
    * counter matrix (256 KB at defaults) regardless of how many
    * events the window sees — the textbook answer to "top terms per
    * hour" on a stream too large to count exactly. The aggregate is
    * [[graft.functions.CountMinSketchAgg]]: partial buffers merge
    * associatively, so the micro-batch partials combine map-side and
    * the state-store value is the running matrix. Deterministic: the
    * finalized window's sketch is a pure function of the window's
    * events, so a stream run equals the batch groupBy over the same
    * data (StreamHeavyHittersSpec's differential).
    */
  def windowedSketch(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String,
      depth: Int = graft.functions.CountMinSketch.DefaultDepth,
      width: Int = graft.functions.CountMinSketch.DefaultWidth): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(graft.functions.CountMinSketch.sketch(col(valueCol), depth, width).as("sketch"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("sketch"))

  /** Heavy-hitter probe of per-window sketches: for each candidate
    * (window_start, term) row, the sketch estimate — never an
    * underestimate — filtered to `threshold`. Stateless projection
    * over the (small) windowed-sketch side; works identically on the
    * batch twin, which is how the differential spec gates it.
    */
  def heavyHitters(
      windowedSketches: DataFrame,
      candidates: DataFrame,
      termCol: String,
      threshold: Long,
      depth: Int = graft.functions.CountMinSketch.DefaultDepth,
      width: Int = graft.functions.CountMinSketch.DefaultWidth): DataFrame =
    windowedSketches
      .join(candidates, Seq("window_start"))
      .select(
        col("window_start"),
        col(termCol).as("term"),
        graft.functions.CountMinSketch
          .estimate(col("sketch"), col(termCol), depth, width).as("est"))
      .filter(col("est") >= threshold)

  /** Per-window HyperLogLog registers + estimate: the bounded-state
    * streaming distinct count ("unique users per hour" on a stream too
    * large to hold the distinct set). State per window is the fixed
    * 2^p register array (1 KB at the default p=10) regardless of event
    * volume; [[graft.functions.HyperLogLogAgg]]'s max-merge makes the
    * micro-batch partials combine map-side and the finalized window a
    * pure function of the window's events, so a stream run equals the
    * batch groupBy over the same data register for register
    * (StreamHllSpec's differential).
    */
  def windowedDistinct(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String,
      p: Int = graft.functions.HyperLogLog.DefaultP): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(graft.functions.HyperLogLog.sketch(col(valueCol), p).as("registers"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("registers"),
        round(graft.functions.HyperLogLog.estimate(col("registers"), p), 6)
          .as("approx_distinct"))

  /** Per-window histogram sketch + quantile reads: streaming latency/
    * size percentiles at `numBuckets + 2` longs of state per active
    * window ([[graft.functions.HistogramSketchAgg]]; vector-add merge
    * keeps micro-batch partials map-combinable and a finalized window
    * equal to its batch twin counter for counter —
    * StreamHistogramSpec's differential).
    */
  def windowedHistogram(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: String,
      numBuckets: Int,
      lo: Double,
      hi: Double): DataFrame = {
    val H = graft.functions.HistogramSketch
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(H.sketch(col(valueCol), numBuckets, lo, hi).as("counters"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("counters"),
        H.quantile(col("counters"), 0.5, numBuckets, lo, hi).as("p50"),
        H.quantile(col("counters"), 0.95, numBuckets, lo, hi).as("p95"))
  }

  /** Kolmogorov–Smirnov drift of each window's histogram against a
    * STATIC reference histogram (same bucket geometry): the bounded-
    * state streaming twin of [[graft.operators.CorpusDrift.ksStatistic]]
    * — the exact per-point ECDF needs an ordered pass over every
    * distinct value (unbounded state on a stream), so the stream form
    * compares BUCKET ECDFs, which is the exact KS of the bucketed
    * distributions. Integer cross-multiplied supremum, so stream ==
    * batch to the bit (StreamKsSpec's differential).
    *
    * The reference counters ride the plan as a literal (they are
    * `numBuckets + 2` longs from a reference corpus aggregation); the
    * per-window fold is a few-dozen-element HOF on the one row per
    * window the state store emits — interpretation cost is per window,
    * not per event.
    *
    * @return windowed rows + (n_window, d_num, ks_micro)
    */
  def histogramKs(
      windowedHistograms: DataFrame,
      refCounters: Seq[Long]): DataFrame = {
    require(refCounters.nonEmpty && refCounters.forall(_ >= 0L),
      "reference counters must be non-negative")
    val nB = refCounters.sum
    require(nB > 0L, "reference histogram must be non-empty")
    val cumB = refCounters.scanLeft(0L)(_ + _).tail
    val b = refCounters.size
    val idx = sequence(lit(1), lit(b))
    val cumA = transform(idx, i =>
      aggregate(slice(col("counters"), lit(1), i), lit(0L), (acc, x) => acc + x))
    val nA = aggregate(col("counters"), lit(0L), (acc, x) => acc + x)
    windowedHistograms
      .withColumn("__cuma", cumA)
      .withColumn("__na", nA)
      .withColumn("d_num",
        array_max(zip_with(col("__cuma"), typedLit(cumB), (a, bc) =>
          abs(a * lit(nB) - bc * col("__na")))))
      .withColumn("n_window", col("__na"))
      .withColumn("ks_micro",
        // d_num can reach __na*nB, so the *1e6 scaling must leave long
        // arithmetic before multiplying: decimal(38,0) on both sides
        expr(s"cast(cast(d_num as decimal(38,0)) * 1000000 div " +
          s"(cast(__na as decimal(38,0)) * ${nB}L) as long)"))
      .drop("__cuma", "__na")
  }

  /** Sliding-window variant. */
  def slidingCounts(
      df: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      windowDuration: String,
      slideDuration: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration, slideDuration) +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(Seq(col("window.start").as("window_start"), col("window.end").as("window_end")) ++
        groupCols.map(col) :+ col("n"): _*)
}
