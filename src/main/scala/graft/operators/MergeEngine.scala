package graft.operators

import graft.config.TableConfig

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import java.util.UUID

/** Monotone-version MERGE engine over partitioned parquet tables.
  *
  * Re-creates, Spark-first, the capability the reference delegates to
  * Delta Lake's `MERGE INTO` (reference: src/kafka2delta/stream/
  * stream.py:114-148):
  *
  *   - [[resolveUpsert]] ≙ `WHEN MATCHED AND target.lsn < source.lsn THEN
  *     UPDATE SET * WHEN NOT MATCHED THEN INSERT *` (stream.py:114-133).
  *     The strict `<` guard makes replays idempotent: a stale row can
  *     never overwrite a newer one (ties keep the target row).
  *   - [[resolveDelete]] ≙ `WHEN MATCHED THEN DELETE` on primary key only,
  *     with NO version guard (stream.py:135-148) — deliberate reference
  *     semantics, preserved exactly.
  *   - Schema evolution ≙ Delta `schema.autoMerge` (conftest.py:101):
  *     both directions via `unionByName(allowMissingColumns = true)` —
  *     new source columns appear (old rows null), dropped source columns
  *     persist (new rows null).
  *   - Partition pruning ≙ the reference's manual inclusion of partition
  *     columns in the merge keys (stream.py:116-117): upserts only read
  *     and rewrite partitions present in the source batch; deletes only
  *     rewrite partitions that actually contained a matched key.
  *
  * Physical design, chosen for the 100 TB case:
  *   - The upsert is ONE shuffle at most: union target-slice + source,
  *     then a max_by aggregate with partial/final phases (map-side
  *     combine, skew-bounded) — and when the inputs are already
  *     partitioned on the keys (e.g. right after the batch dedup) the
  *     planner inserts NO further exchange at all. No full-outer join.
  *   - Writes use staged-then-swap with a commit manifest: resolved rows
  *     land in a staging dir laid out exactly like the target, a
  *     manifest records the transaction (touched partitions, staging and
  *     backup locations), old partition dirs are renamed into a backup
  *     dir and staged dirs renamed into place, and deleting the manifest
  *     is the commit point. Untouched partitions are never read or
  *     written. A crash at ANY point before the commit point is rolled
  *     back by [[recoverTable]] (invoked automatically from
  *     [[readTable]]): the table is restored bit-for-bit to its
  *     pre-merge version and the replayed micro-batch re-applies
  *     idempotently (checkpoint + monotone-version guard). Delta gets
  *     the same property from its log; here the manifest + rename swap
  *     provides it without a log format. Single-writer, like the
  *     reference's one streaming query per table.
  */
object MergeEngine {

  private val TagCol = "__graft_src"

  // ---------------------------------------------------------------------
  // Pure plan forms (no I/O) — usable as batch operators in their own right
  // ---------------------------------------------------------------------

  /** Merge `source` into `target` with monotone-version semantics.
    *
    * Assumes `target` has at most one row per key and `source` has been
    * deduplicated to one row per key ([[CdcDedup.latestPerKey]]).
    * `keyCols` should be pk + partition cols (stream.py:116).
    */
  def resolveUpsert(
      target: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    val t = target.withColumn(TagCol, lit(0))
    val s = source.withColumn(TagCol, lit(1))
    val unioned = t.unionByName(s, allowMissingColumns = true)
    // Highest version wins; on a version tie the target row (tag 0) wins,
    // which is exactly the strict `target.lsn < source.lsn` guard (the
    // ordering key is (version, -tag), so equal versions prefer tag 0).
    // Aggregation form (max_by) rather than a row_number window: partial
    // aggregation bounds the shuffle to one row per key per map
    // partition, and as an Aggregate it reuses an upstream partitioning
    // on the keys (dedup + merge share one exchange — see CdcDedup doc).
    CdcDedup
      .latestPerKeyAgg(unioned, keyCols, struct(col(versionCol), -col(TagCol)))
      .drop(TagCol)
  }

  /** Remove from `target` every row whose primary key appears in
    * `deletes`. Matches on pk ONLY and has no version guard — reference
    * J2 semantics (stream.py:135-148).
    */
  def resolveDelete(target: DataFrame, deletes: DataFrame, pkCols: Seq[String]): DataFrame =
    target.join(deletes.select(pkCols.map(col): _*).distinct(), pkCols, "left_anti")

  // ---------------------------------------------------------------------
  // Table-backed operations
  // ---------------------------------------------------------------------

  /** Read a MergeEngine-managed table. `mergeSchema` handles files written
    * before a schema evolution (untouched partitions keep old schema).
    * Returns None when the table has no data yet.
    */
  def readTable(spark: SparkSession, path: String): Option[DataFrame] =
    try Some(spark.read.option("mergeSchema", "true").parquet(path))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Create an empty, optionally partitioned, catalog-registered table if
    * absent (reference: utils.py:37-58).
    */
  def createTableIfNotExists(spark: SparkSession, schema: StructType, cfg: TableConfig): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${cfg.schema}")
    if (!spark.catalog.tableExists(cfg.qualifiedName)) {
      val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      val writer = empty.write.format("parquet").mode("ignore").option("path", cfg.path)
      (if (cfg.partitionCols.nonEmpty) writer.partitionBy(cfg.partitionCols: _*) else writer)
        .saveAsTable(cfg.qualifiedName)
    }
  }

  /** MERGE-upsert `source` into the table at `cfg.path`.
    *
    * Only partitions present in `source` are read from the target and
    * rewritten (static partition pruning: the touched partition values are
    * collected — they are few — and pushed as scan filters).
    */
  def upsert(
      spark: SparkSession,
      cfg: TableConfig,
      source: DataFrame,
      pkCols: Seq[String],
      versionCol: String): Unit = {
    if (source.isEmpty) return
    val keys = (pkCols ++ cfg.partitionCols).distinct
    readTable(spark, cfg.path) match {
      case None =>
        write(spark, cfg, source, overwriteAll = true)
      case Some(target) =>
        val slice =
          if (cfg.partitionCols.isEmpty) target
          else {
            val touched = source.select(cfg.partitionCols.map(col): _*).distinct().collect()
            if (touched.isEmpty) return
            target.filter(partitionPredicate(cfg.partitionCols, touched))
          }
        val resolved = resolveUpsert(slice, source, keys, versionCol)
        writeStaged(spark, cfg, resolved, overwriteAll = cfg.partitionCols.isEmpty)
    }
    syncCatalog(spark, cfg)
  }

  /** Keep a registered catalog table consistent with the path: discover
    * partitions added by direct path writes (MSCK-equivalent).
    */
  private def syncCatalog(spark: SparkSession, cfg: TableConfig): Unit =
    if (cfg.partitionCols.nonEmpty && spark.catalog.tableExists(cfg.qualifiedName)) {
      try spark.catalog.recoverPartitions(cfg.qualifiedName)
      catch { case _: org.apache.spark.sql.AnalysisException => () } // not a partitioned catalog table
    }

  /** MERGE-delete: remove rows matching `deletes` pks. Scans the full
    * table to find affected partitions (pk-only match — J2 semantics
    * can't prune by partition), but rewrites only partitions that
    * contained a matched key; partitions left empty are dropped.
    */
  def delete(
      spark: SparkSession,
      cfg: TableConfig,
      deletes: DataFrame,
      pkCols: Seq[String]): Unit = {
    if (deletes.isEmpty) return
    readTable(spark, cfg.path).foreach { target =>
      if (cfg.partitionCols.isEmpty) {
        val survivors = resolveDelete(target, deletes, pkCols)
        if (survivors.isEmpty) truncate(spark, cfg) // delete-all: no rows to stage
        else writeStaged(spark, cfg, survivors, overwriteAll = true)
      } else {
        val keys = deletes.select(pkCols.map(col): _*).distinct()
        val affected = target
          .join(keys, pkCols, "left_semi")
          .select(cfg.partitionCols.map(col): _*)
          .distinct()
          .collect()
        if (affected.isEmpty) return
        val slice = target.filter(partitionPredicate(cfg.partitionCols, affected))
        val survivors = resolveDelete(slice, deletes, pkCols)
        val kept =
          if (survivors.isEmpty) Array.empty[Row]
          else writeStaged(spark, cfg, survivors, overwriteAll = false)
        // Dynamic overwrite only replaces partitions that received rows;
        // affected partitions with zero survivors must be removed.
        val keptSet = kept.map(_.toSeq).toSet
        val emptied = affected.filterNot(r => keptSet.contains(r.toSeq))
        if (emptied.nonEmpty) dropPartitionDirs(spark, cfg, emptied)
      }
    }
  }

  /** Remove all data for a table (used when a delete empties an
    * unpartitioned table).
    */
  private def truncate(spark: SparkSession, cfg: TableConfig): Unit = {
    val root = new Path(cfg.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    ()
  }

  /** Compact a merge table's small files (micro-batch CDC writes leave
    * one file set per touched partition per batch; at 100 TB the read
    * amplification from thousands of tiny files dominates scan cost).
    *
    * Rewrites each partition whose file count exceeds
    * `maxFilesPerPartition` into `ceil(bytes / targetFileBytes)` files
    * via the same staged dynamic-overwrite path the merge uses.
    * Untouched partitions keep their files. Returns the number of
    * partitions compacted.
    */
  def compact(
      spark: SparkSession,
      cfg: TableConfig,
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxFilesPerPartition: Int = 4): Int = {
    val root = new Path(cfg.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0

    def dataFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))

    if (cfg.partitionCols.isEmpty) {
      val files = dataFiles(root)
      if (files.size <= maxFilesPerPartition) 0
      else {
        val target = math.max(1, math.ceil(files.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
        readTable(spark, cfg.path).foreach(t => writeStaged(spark, cfg, t.repartition(target), overwriteAll = true))
        1
      }
    } else {
      // partition dirs: depth = partitionCols.size below the root
      def partitionDirs(dir: Path, depth: Int): Seq[Path] =
        if (depth == 0) Seq(dir)
        else fs.listStatus(dir).toSeq.filter(_.isDirectory).flatMap(d => partitionDirs(d.getPath, depth - 1))
      val oversized = partitionDirs(root, cfg.partitionCols.size)
        .map(d => d -> dataFiles(d))
        .filter(_._2.size > maxFilesPerPartition)
      val qualifiedRoot = fs.makeQualified(root).toString
      oversized.foreach { case (dir, files) =>
        val rel = fs.makeQualified(dir).toString.stripPrefix(qualifiedRoot).stripPrefix("/")
        val pred = rel.split("/").map { seg =>
          val Array(k, v) = seg.split("=", 2)
          if (v == "__HIVE_DEFAULT_PARTITION__") col(k).isNull else col(k) === lit(v)
        }.reduce(_ && _)
        val target = math.max(1, math.ceil(files.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
        readTable(spark, cfg.path).foreach { t =>
          writeStaged(spark, cfg, t.filter(pred).repartition(target), overwriteAll = false)
        }
      }
      oversized.size
    }
  }

  // ---------------------------------------------------------------------

  private def partitionPredicate(partCols: Seq[String], values: Array[Row]) =
    values
      .map { r =>
        partCols.zipWithIndex
          .map { case (c, i) => col(c) <=> lit(r.get(i)) }
          .reduce(_ && _)
      }
      .reduce(_ || _)

  private def write(
      spark: SparkSession,
      cfg: TableConfig,
      df: DataFrame,
      overwriteAll: Boolean): Unit = {
    // within-partition sort -> parquet row-group min/max stats cluster
    // on sortCols, so later point/range scans skip row groups
    val clustered =
      if (cfg.sortCols.isEmpty) df
      else df.sortWithinPartitions(cfg.sortCols.map(col): _*)
    val writer = clustered.write
      .mode("overwrite")
      .option("partitionOverwriteMode", if (overwriteAll) "static" else "dynamic")
    (if (cfg.partitionCols.nonEmpty) writer.partitionBy(cfg.partitionCols: _*) else writer)
      .parquet(cfg.path)
  }

  /** Materialize `df` to a staging dir (breaking lineage against the
    * target we are about to overwrite), then swap it in via dynamic
    * partition overwrite. Returns the partition values written.
    */
  private def writeStaged(
      spark: SparkSession,
      cfg: TableConfig,
      df: DataFrame,
      overwriteAll: Boolean): Array[Row] = {
    val staging = s"${cfg.path}__staging_${UUID.randomUUID().toString.take(8)}"
    val fs = new Path(cfg.path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      df.write.mode("overwrite").parquet(staging)
      val back = spark.read.option("mergeSchema", "true").parquet(staging)
      write(spark, cfg, back, overwriteAll)
      if (cfg.partitionCols.nonEmpty)
        back.select(cfg.partitionCols.map(col): _*).distinct().collect()
      else Array.empty[Row]
    } finally {
      fs.delete(new Path(staging), true)
      ()
    }
  }

  private def dropPartitionDirs(spark: SparkSession, cfg: TableConfig, parts: Array[Row]): Unit = {
    val root = new Path(cfg.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    parts.foreach { r =>
      val rel = cfg.partitionCols.zipWithIndex
        .map { case (c, i) =>
          val v = Option(r.get(i)).map(_.toString).getOrElse("__HIVE_DEFAULT_PARTITION__")
          s"$c=$v"
        }
        .mkString("/")
      fs.delete(new Path(root, rel), true)
    }
  }
}
