package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge between graft's custom logical plans and the public Dataset
  * API. Spark 4 moved `Dataset.ofRows` and `queryExecution` behind the
  * `classic` implementation split; this shim re-exports the two entry
  * points a library needs to inject its own `LogicalPlan` nodes — the
  * same technique as [[GraftColumnShim]] for expressions.
  */
object GraftPlanShim {
  /** Wrap an already-resolved logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Test access to `private[sql]` extension builders: what would this
    * extensions object contribute to a session built with it?
    */
  def buildStrategies(
      e: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    e.buildPlannerStrategies(spark)

  def registerFunctions(
      e: SparkSessionExtensions,
      r: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    e.registerFunctions(r)
}
