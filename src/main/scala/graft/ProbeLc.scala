package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc check (not part of the driver contract): does
  * `localCheckpoint(true)` preserve optimizer statistics (and thus
  * auto-broadcast decisions) in this Spark build, and what does it do
  * to plan-string size for a frame built over cached lineage?
  * Run: `sbt "runMain graft.ProbeLc"`.
  */
object ProbeLc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val small = spark.range(0, 100).select(col("id"), lit("x").as("tag"))
    val smallP = small.persist(); smallP.count()
    val smallC = small.localCheckpoint(true)
    println("[lc] persisted stats: " + smallP.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("[lc] checkpointed stats: " + smallC.queryExecution.optimizedPlan.stats.sizeInBytes)

    val big = spark.range(0, 1000000).select(col("id"), (col("id") % 7).as("k"))
    val j = big.join(smallC, "id")
    val plan = j.queryExecution.executedPlan.toString
    println("[lc] join strategy vs checkpointed small side: " +
      (if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin" else plan.linesIterator.take(12).mkString(" | ")))

    // nested-cache plan-size comparison
    val a = big.groupBy(col("k")).agg(sum(col("id")).as("s")).persist(); a.count()
    val b = a.join(a.withColumnRenamed("s", "s2"), "k").persist(); b.count()
    val c = b.join(b.withColumnRenamed("s", "s3"), "k")
    println("[lc] nested-persist plan chars: " + c.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).length)
    val bT = b.localCheckpoint(true)
    val cT = bT.join(bT.withColumnRenamed("s", "s3"), "k")
    println("[lc] truncated plan chars: " + cT.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).length)
    println("[lc] rows equal: " + (c.count() == cT.count()))
    spark.stop()
  }
}
