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
    * to their group by the file they came from (matched on the
    * basename `input_file_name()` reports), hash-repartitioned so each
    * group is written by exactly one task, and committed through
    * [[StagedSwap.rotateIn]] — a crash mid-rewrite leaves the previous
    * layout live. `keep` files are untouched (a real table format
    * swaps them by metadata, not by copying bytes).
    *
    * `planned`'s `fileCol` must hold absolute paths whose basenames
    * are unique across the rewrite set (parquet part-file names are).
    *
    * @return the number of rewrite groups written
    */
  def execute(
      spark: SparkSession,
      planned: DataFrame,
      partCol: String,
      fileCol: String,
      outDir: String): Long = {
    val rewrite = planned.filter(col("action") === "rewrite")
      .select(
        element_at(split(col(fileCol), "/"), -1).as("__base"),
        col(fileCol).as("__path"), col(partCol).as("__part"),
        col("grp").as("__grp"))
    val paths = rewrite.select("__path").collect().map(_.getString(0))
    if (paths.isEmpty) return 0L
    val routes = rewrite.select("__base", "__part", "__grp")
    val nGroups = routes.select("__part", "__grp").distinct().count()
    StagedSwap.rotateIn(spark, outDir) { stage =>
      spark.read.parquet(paths.toIndexedSeq: _*)
        .withColumn("__base", element_at(split(input_file_name(), "/"), -1))
        .join(broadcast(routes), "__base")
        .drop("__base")
        .repartition(nGroups.toInt.max(1), col("__part"), col("__grp"))
        .write.partitionBy("__part", "__grp").parquet(stage)
      ()
    }
    nGroups
  }
}
