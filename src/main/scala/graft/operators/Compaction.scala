package graft.operators

import graft.sources.StagedSwap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning and execution — the table-
  * maintenance step every large parquet table needs (the reference's
  * Delta tables get it from OPTIMIZE; here it is a first-class
  * operator over any (file, partition, bytes) inventory, e.g. a
  * [[graft.sources.FileManifest]] listing).
  *
  * The planner is pure plan algebra: files at or above the target
  * size KEEP their identity (rewriting them burns IO for nothing);
  * smaller files pack into rewrite groups by a running-sum cut over
  * the canonical file order, so a group's bytes land in
  * [target, target + largest member) except possibly the last group
  * per partition. Groups never span partitions — compaction must
  * preserve partition pruning.
  *
  * Scale shape: ONE shuffle on the partition key and one window over
  * it — no collect, no global sort; the inventory is metadata
  * (O(files), not O(rows)), so this plans a 100 TB table's compaction
  * from megabytes of input. Execution reads only the rewrite groups
  * (one job, hash-routed so each group lands in exactly one output
  * file) and commits through [[StagedSwap]], so a crashed compaction
  * never becomes the live layout.
  */
object Compaction {

  /** Assign every file to a compaction group.
    *
    * Output: the input columns plus `grp` (non-negative for rewrite
    * groups, numbered per partition in canonical file order; -1, -2,
    * ... for keep-as-is files in the same order) and `action`
    * (`rewrite` for members of a multi-file group, `keep` for big
    * files and for a small file left alone in its trailing group).
    *
    * The cut rule is integer-exact (`div`, no doubles), so byte
    * ledgers past 2^53 still plan correctly.
    */
  def plan(
      files: DataFrame,
      partCol: String,
      fileCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val byFile = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
    // explicit ROWS frame: the orderBy default is RANGE, which treats
    // duplicate (part, file) keys as peers and double-counts their
    // bytes in each other's running sum — the cut must follow the
    // canonical ROW order even when file names collide
    val cumFrame = byFile.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val small = files.filter(col(bytesCol) < targetBytes)
      .withColumn("__cum", sum(col(bytesCol)).over(cumFrame))
      .withColumn("grp",
        expr(s"CAST((__cum - $bytesCol) div $targetBytes AS BIGINT)"))
      .drop("__cum")
    val big = files.filter(col(bytesCol) >= targetBytes)
      .withColumn("grp", -row_number().over(byFile).cast("long"))
    val planned = small.unionByName(big)
    val perGroup = Window.partitionBy(col(partCol), col("grp"))
    planned.withColumn("action",
      when(col("grp") >= 0 && count(lit(1)).over(perGroup) > 1, lit("rewrite"))
        .otherwise(lit("keep")))
  }

  /** Per-group roll-up of a [[plan]]: one row per (partition, group)
    * with its member count, byte total, and canonical first/last
    * member — the ledger a maintenance job logs before rewriting.
    */
  def groupSummary(planned: DataFrame, partCol: String, fileCol: String,
      bytesCol: String): DataFrame =
    planned.groupBy(col(partCol), col("grp"), col("action"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("total_bytes"),
        min(col(fileCol)).as("first_file"),
        max(col(fileCol)).as("last_file"))

  /** Rewrite every `rewrite` group of `planned` into exactly one
    * parquet file per group under `outDir/part=<p>/grp=<g>/`, in ONE
    * job: the group's source files are read together, rows are routed
    * to their group by the file they came from, hash-repartitioned so
    * each group is written by exactly one task, and committed through
    * [[StagedSwap.rotateIn]] — a crash mid-rewrite leaves the previous
    * layout live. `keep` files are untouched (a real table format
    * swaps them by metadata, not by copying bytes).
    *
    * Routing matches on the SCHEME-NORMALIZED ABSOLUTE PATH (the r17
    * 2k-file scale spec caught the previous basename match silently
    * multiplying rows: a standard `partitionBy` write reuses one
    * task's part-file name across every partition directory, so
    * basenames are NOT unique in exactly the layouts compaction
    * exists for). `input_file_name()` reports a URI
    * (`file:///p/part=0/f.parquet`, percent-encoded); the inventory
    * may carry any equivalent form — both sides normalize to the
    * decoded path (`/p/part=0/f.parquet`), and a duplicate normalized
    * path in the rewrite set fails loudly rather than double-counting
    * rows. The route table is collected (O(rewrite files), the same
    * driver bound as the read-path list) and broadcast.
    *
    * Two fail-loudly refinements (r18 review): `url_decode` has FORM
    * semantics ('+' decodes to a space) while `input_file_name()`
    * leaves '+' unencoded and the driver-side canon keeps it literal —
    * so '+' is re-escaped to `%2B` before decoding (a partition value
    * like `UTC+8` routes instead of silently losing every row); and
    * the route join is a LEFT join with an in-plan `raise_error` on
    * any unrouted row, so canon/input_file_name normalization drift
    * (a symlinked root, an inventory form the canon cannot reduce)
    * fails the job with the offending path instead of shrinking the
    * output.
    *
    * @return the number of rewrite groups written
    */
  def execute(
      spark: SparkSession,
      planned: DataFrame,
      partCol: String,
      fileCol: String,
      outDir: String): Long = {
    val rewriteRows = planned.filter(col("action") === "rewrite")
      .select(col(fileCol).cast("string"), col(partCol).cast("string"), col("grp"))
      .collect() // bounded: O(rewrite files) — metadata, not rows
    if (rewriteRows.isEmpty) return 0L
    def canon(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val routeTuples = rewriteRows.toIndexedSeq
      .map(r => (canon(r.getString(0)), r.getString(1), r.getLong(2)))
    require(routeTuples.map(_._1).distinct.size == routeTuples.size,
      "Compaction.execute: duplicate file paths in the rewrite set — " +
        "the inventory lists a file twice")
    val paths = rewriteRows.map(_.getString(0)).toIndexedSeq
    val nGroups = routeTuples.map(t => (t._2, t._3)).distinct.size.toLong
    import spark.implicits._
    val routes = routeTuples.toDF("__key", "__part", "__grp")
    StagedSwap.rotateIn(spark, outDir) { stage =>
      // strip scheme+authority, re-escape literal '+' (url_decode is
      // form-decoding: a bare '+' would become a space and mismatch
      // the driver canon), then percent-decode
      val normalized = url_decode(regexp_replace(
        regexp_replace(input_file_name(),
          "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", ""),
        "\\+", "%2B"))
      spark.read.parquet(paths: _*)
        .withColumn("__key", normalized)
        .join(broadcast(routes), Seq("__key"), "left")
        .withColumn("__part",
          when(col("__part").isNull,
            raise_error(concat(
              lit("Compaction.execute: row from unrouted file "),
              col("__key"),
              lit(" — inventory/input_file_name path normalization drift"))))
            .otherwise(col("__part")))
        .drop("__key")
        .repartition(nGroups.toInt.max(1), col("__part"), col("__grp"))
        .write.partitionBy("__part", "__grp").parquet(stage)
      ()
    }
    nGroups
  }
}
