package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Dev probe: dump FileSourceScan metadata (PushedFilters /
  * PartitionFilters / file counts) for the named queries, recursing
  * through InMemoryRelation cached plans — evidence for PlanAudit's
  * prune-expectation regexes. Usage: runMain graft.ProbePrune q1 q2 ..
  */
object ProbePrune {
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    p.foreachWithSubqueries {
      case i: InMemoryTableScanExec =>
        f(i)
        walk(i.relation.cachedPlan)(f)
      case n => f(n)
    }
  }

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
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"===== $name")
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      walk(plan) {
        case s: FileSourceScanExec =>
          println(s"-- scan files=${s.relation.location.inputFiles.length}")
          s.metadata.toSeq.sortBy(_._1).foreach { case (k, v) =>
            if (k != "ReadSchema") println(s"   $k: ${v.take(300)}")
          }
        case r: org.apache.spark.sql.execution.RDDScanExec =>
          println(s"-- RDDScan ${r.nodeName}")
        case _ =>
      }
    }
    spark.stop()
  }
}
