package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group z-score outlier detection — the metric-anomaly gate
  * (flag events whose value sits beyond k·σ of their group) computed
  * ENTIRELY in integer space: values quantize to a milli-grid, the
  * group moments (n, Σv, Σv²) are exact decimal sums, and the flag
  * evaluates the cross-multiplied inequality
  *
  *   den² · (n·v − S)²  >  num² · (n·Q − S²)
  *
  * which is |v − S/n| > (num/den)·σ_pop with every division and square
  * root eliminated — no float σ, no engine-dependent summation order,
  * so the exact same rows flag on any engine (the DuckDB oracle
  * replays it in HUGEINT).
  *
  * Scale shape: one map-side-combinable moment aggregation (group-
  * cardinality-sized output), joined back broadcast-or-hash on the
  * group key, then a stateless filter over the scan. Nothing about
  * the corpus size touches the driver.
  */
object Outliers {

  /** Milli-grid quantization scale. */
  val Scale: Double = 1000.0

  /** Rows whose quantized value lies beyond `(num/den)`·σ of their
    * group's mean (population σ, the moments form). Returns the input
    * columns plus `vmilli` — the quantized value the decision used.
    */
  def zScoreOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      thresholdNum: Int = 5,
      thresholdDen: Int = 2): DataFrame = {
    require(thresholdNum > 0 && thresholdDen > 0, "threshold must be a positive rational")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val withV = df.withColumn("vmilli", floor(valueCol * Scale).cast("long"))
    val stats = withV
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(col("vmilli").cast("decimal(20,0)")).as("__s"),
        sum(col("vmilli").cast("decimal(20,0)") * col("vmilli").cast("decimal(20,0)")).as("__q"))
    val d = dec(col("__n")) * dec(col("vmilli")) - dec(col("__s"))
    val varTerm = dec(col("__n")) * dec(col("__q")) - dec(col("__s")) * dec(col("__s"))
    withV
      .join(stats, groupCols)
      .filter(lit(thresholdDen.toLong * thresholdDen) * d * d >
        lit(thresholdNum.toLong * thresholdNum) * varTerm)
      .drop("__n", "__s", "__q")
  }

  /** Robust per-group outliers by Median Absolute Deviation: flag rows
    * with `|v − median| > (num/den) · MAD` — the detector that
    * survives what breaks z-scores (a heavy-tailed group inflates σ
    * until the outliers hide; the median and MAD barely move). Both
    * the median and the MAD are DISCRETE rank statistics (the value at
    * rank ceil(n/2) — the `value_winsorize` convention: an actual data
    * point, no interpolation), so with milli-grid quantized values the
    * entire decision is exact integer arithmetic and replays on any
    * engine.
    *
    * Scale shape: two ranked passes per group (value rank for the
    * median, deviation rank for the MAD) — each a window sort keyed by
    * the group columns — plus group-sized joins back. The group-key
    * sort is the inherent cost of an exact rank statistic; at corpus
    * scale swap in the histogram-sketch quantile
    * ([[graft.functions.HistogramSketch]]) for the same query shape
    * with fixed state.
    *
    * @return input columns + (vmilli, med_milli, mad_milli)
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      thresholdNum: Int = 6,
      thresholdDen: Int = 1): DataFrame = {
    require(thresholdNum > 0 && thresholdDen > 0, "threshold must be a positive rational")
    import org.apache.spark.sql.expressions.Window
    val gCols = groupCols.map(col)
    val withV = df.withColumn("vmilli", floor(valueCol * Scale).cast("long"))
    val wAll = Window.partitionBy(gCols: _*)
    val medRank = withV
      .withColumn("__rn", row_number()
        .over(Window.partitionBy(gCols: _*).orderBy(col("vmilli"))).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
    val med = medRank.groupBy(gCols: _*)
      .agg(max(when(col("__rn") === expr("(__n + 1) div 2"), col("vmilli")))
        .as("med_milli"))
    val withDev = withV.join(med, groupCols)
      .withColumn("__dev", abs(col("vmilli") - col("med_milli")))
    val devRank = withDev
      .withColumn("__rn", row_number()
        .over(Window.partitionBy(gCols: _*).orderBy(col("__dev"))).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
    val mad = devRank.groupBy(gCols: _*)
      .agg(max(when(col("__rn") === expr("(__n + 1) div 2"), col("__dev")))
        .as("mad_milli"))
    withDev.join(mad, groupCols)
      .filter(col("__dev") * lit(thresholdDen.toLong) >
        lit(thresholdNum.toLong) * col("mad_milli"))
      .drop("__dev")
  }
}
