package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Dev probe: print every BroadcastNestedLoopJoin's build side (via
  * PlanAudit's walk, cached plans included) for the named queries —
  * evidence for QuerySetBnlj count justifications.
  * Usage: runMain graft.ProbeBnlj q1 q2 ..
  */
object ProbeBnlj {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name")
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      var i = 0
      PlanAudit.walkAll(plan) {
        case j: BroadcastNestedLoopJoinExec =>
          val build = j.buildSide match {
            case BuildRight => j.right
            case BuildLeft => j.left
          }
          i += 1
          println(s"-- bnlj #$i bound=${PlanAudit.boundedRows(build)} join=${j.joinType}")
          println(build.treeString.linesIterator.take(12).map("   " + _).mkString("\n"))
        case _ =>
      }
    }
    spark.stop()
  }
}
