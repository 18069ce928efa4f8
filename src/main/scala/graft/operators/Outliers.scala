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
        sum((col("vmilli") * col("vmilli")).cast("decimal(30,0)")).as("__q"))
    val d = dec(col("__n")) * dec(col("vmilli")) - dec(col("__s"))
    val varTerm = dec(col("__n")) * dec(col("__q")) - dec(col("__s")) * dec(col("__s"))
    withV
      .join(stats, groupCols)
      .filter(lit(thresholdDen.toLong * thresholdDen) * d * d >
        lit(thresholdNum.toLong * thresholdNum) * varTerm)
      .drop("__n", "__s", "__q")
  }
}
