package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspector: prints `explain("formatted")` for the named
  * queries (all queries when none given). Used to keep plans honest —
  * filters pushed to the scan, projections pruned, small dims broadcast,
  * wide codegen stages.
  *
  * Run: `sbt "runMain graft.Plans [sfDir] [query ...]"`.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n==================== $n ====================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
