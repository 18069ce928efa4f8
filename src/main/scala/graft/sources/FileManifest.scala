package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** File-level statistics manifest over a parquet directory — the
  * data-skipping layer a lakehouse table format keeps in its log,
  * built here from the parquet FOOTERS the files already carry: one
  * footer read per file (O(files), never O(rows)), no data pages
  * touched. Combined with a z-ordered or sorted write
  * ([[graft.operators.ZOrder]], `TableConfig.sortCols`), the manifest
  * turns a point/range predicate into a file subset long before any
  * scan task launches — the planning-time half of the pruning story
  * whose scan-time half (`PushedFilters`, partition pruning) this
  * engine already plan-asserts.
  *
  * Scale shape: the file listing is one recursive metadata pass; the
  * footer reads fan out as a Spark job over the file list (a million
  * files is a million ~8 KB footer reads across the cluster, zero
  * row decoding). Statistics aggregate per file from the row-group
  * blocks — min of mins, max of maxs, exact sums — so the manifest is
  * a pure function of the files and replays anywhere
  * (`file_manifest_stats` gates it against a full data-scan
  * recomputation AND the SQL oracle).
  *
  * Integral (INT32/INT64) columns only — the key/bucket columns
  * pruning actually uses; extending to binary stats is mechanical.
  */
object FileManifest {

  /** One manifest row per (file, column): exact per-file row count,
    * min/max over the file's row groups, and the null count.
    *
    * @return (file, column, n_rows, min_v, max_v, n_nulls)
    */
  def build(spark: SparkSession, path: String, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "statCols must be non-empty")
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val files = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) files += f.getPath.toString
    }
    val wanted = statCols.toSet
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, files.size))
    spark.createDataset(files.toSeq).repartition(parts)
      .mapPartitions { paths =>
        // executor-local Configuration: footer reads need only the
        // filesystem defaults for the path scheme (object-store creds
        // ride the cluster-wide hadoop conf in a real deployment)
        val conf = new org.apache.hadoop.conf.Configuration()
        paths.flatMap { p =>
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p), conf))
          try {
            val blocks = rdr.getFooter.getBlocks.asScala.toSeq
            val nRows = blocks.map(_.getRowCount).sum
            val perCol = scala.collection.mutable.Map[String, (Long, Long, Long)]()
            blocks.foreach { b =>
              b.getColumns.asScala.foreach { c =>
                val name = c.getPath.toDotString
                if (wanted.contains(name)) {
                  val st = c.getStatistics
                  (st.genericGetMin, st.genericGetMax) match {
                    case (mn: Number, mx: Number) =>
                      val (pmn, pmx, pnl) = perCol.getOrElse(name,
                        (Long.MaxValue, Long.MinValue, 0L))
                      perCol(name) = (
                        math.min(pmn, mn.longValue()),
                        math.max(pmx, mx.longValue()),
                        pnl + st.getNumNulls)
                    case _ => () // non-integral stats: column skipped
                  }
                }
              }
            }
            perCol.toSeq.map { case (c, (mn, mx, nl)) => (p, c, nRows, mn, mx, nl) }
          } finally rdr.close()
        }
      }
      .toDF("file", "column", "n_rows", "min_v", "max_v", "n_nulls")
  }

  /** Files whose `[min_v, max_v]` window on `column` overlaps
    * `[lo, hi]` — the conservative skip set: a file absent from the
    * result provably contains no matching row. Files without a
    * manifest row for the column (all-null or unlisted) are KEPT —
    * pruning must never lose data.
    */
  def pruneFiles(manifest: DataFrame, column: String, lo: Long, hi: Long): DataFrame = {
    val all = manifest.select(col("file")).distinct()
    val covered = manifest.filter(col("column") === column)
    val overlapping = covered
      .filter(col("max_v") >= lo && col("min_v") <= hi)
      .select(col("file"))
    val uncovered = all.join(covered.select(col("file")), Seq("file"), "left_anti")
    overlapping.unionByName(uncovered).distinct()
  }
}
