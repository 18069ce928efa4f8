package graft

import graft.operators.ZOrder
import graft.sources.FileManifest

import org.apache.spark.sql.functions._

/** Footer-derived file statistics must equal a full data scan, and
  * pruning on them must be lossless and, over a z-ordered layout,
  * actually skip files.
  */
class FileManifestSpec extends SparkSpec {
  import spark.implicits._

  test("manifest stats equal a data-scan recomputation, multi-file") {
    val path = tmpDir("manifest-basic")
    (0L until 1000L).map(i => (i, i * 13 % 101)).toDF("a", "b")
      .repartition(4).write.mode("overwrite").parquet(path)
    val manifest = FileManifest.build(spark, path, Seq("a", "b"))
    val byScan = spark.read.parquet(path)
      .select(input_file_name().as("file"), col("a"), col("b"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val byFooter = manifest.collect()
      .groupBy(_.getString(0)).map { case (f, rows) =>
        val m = rows.map(r => r.getString(1) -> (r.getLong(3), r.getLong(4))).toMap
        f -> (rows.head.getLong(2), m("a")._1, m("a")._2, m("b")._1, m("b")._2)
      }
    assert(byFooter.size == 4)
    // input_file_name gives file:// URIs or plain paths depending on
    // the scheme — compare on the basename
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    assert(byFooter.map { case (f, v) => base(f) -> v } ==
      byScan.map { case (f, v) => base(f) -> v },
      s"footer stats diverged from scan")
    // null accounting
    assert(manifest.agg(sum(col("n_nulls"))).head().getLong(0) == 0L)
  }

  test("pruning a z-ordered layout is lossless and skips most files") {
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val path = tmpDir("manifest-zorder")
    ZOrder.writeZordered(grid, Seq("x", "y"), path, bits = 6, numFiles = 16)
    val manifest = FileManifest.build(spark, path, Seq("x", "y"))
    assert(manifest.select(col("file")).distinct().count() == 16)
    for ((c, lo, hi) <- Seq(("x", 17L, 19L), ("y", 40L, 42L))) {
      val kept = FileManifest.pruneFiles(manifest, c, lo, hi)
        .as[String].collect().toSeq
      assert(kept.size <= 8, s"$c pruning weak: ${kept.size} of 16 files kept")
      val prunedRows = spark.read.parquet(kept: _*)
        .filter(col(c) >= lo && col(c) <= hi).count()
      val allRows = spark.read.parquet(path)
        .filter(col(c) >= lo && col(c) <= hi).count()
      assert(prunedRows == allRows && allRows == 3 * 64,
        s"pruning lost rows on $c: $prunedRows vs $allRows")
    }
  }

  test("files without stats for the column are conservatively kept") {
    val path = tmpDir("manifest-uncovered")
    (0L until 50L).map(i => (i, s"s$i")).toDF("a", "s")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val manifest = FileManifest.build(spark, path, Seq("a"))
    // prune on a column the manifest has no rows for: everything kept
    val kept = FileManifest.pruneFiles(manifest, "missing", 0L, 1L).count()
    assert(kept == manifest.select(col("file")).distinct().count())
  }
}
