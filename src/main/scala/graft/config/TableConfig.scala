package graft.config

/** Target-table configuration for CDC replication.
  *
  * Mirrors the capability of the reference's `DeltaTableConfig`
  * (reference: src/kafka2delta/config/config.py:4-29): a catalog
  * schema/table, a storage path, optional derived columns appended to the
  * decoded schema (SQL expression strings such as
  * `"YEAR(created_at) AS year"`), and optional partition columns (which
  * must be produced by `additionalCols` or exist in the decoded schema).
  *
  * `partitionCols` participate in the upsert merge keys so the merge can
  * prune target partitions (reference: stream.py:116-117).
  */
/** @param sortCols optional within-partition sort applied on every
  *                  write: clusters rows so parquet row-group min/max
  *                  statistics prune point/range scans on those columns
  *                  (poor man's clustering/Z-order for one dimension).
  * @param zOrderWrite when true and `sortCols` lists 2+ columns, every
  *                  write sorts by the interleaved Z-order key of
  *                  `sortCols` ([[graft.functions.InterleaveBits]])
  *                  instead of the lexicographic sort: row-group
  *                  min/max stats then prune scans on EVERY sort
  *                  column (each at ~1/N bit precision) rather than
  *                  only the leading one. Same trade as
  *                  OPTIMIZE ZORDER BY in table formats.
  * @param autoCompactEvery when > 0, [[graft.streaming.MicroBatchMerger]]
  *                  runs [[graft.operators.MergeEngine.compact]] on this
  *                  table after every Nth processed micro-batch —
  *                  micro-batch merges intentionally never repartition
  *                  on write (an extra shuffle per batch), so file
  *                  counts grow with batch count until compaction folds
  *                  them (the OPTIMIZE model). 0 (default) = caller
  *                  compacts explicitly.
  */
final case class TableConfig(
    schema: String,
    tableName: String,
    path: String,
    additionalCols: Seq[String] = Seq.empty,
    partitionCols: Seq[String] = Seq.empty,
    sortCols: Seq[String] = Seq.empty,
    zOrderWrite: Boolean = false,
    autoCompactEvery: Int = 0) {
  require(schema.nonEmpty, "schema must be non-empty")
  require(tableName.nonEmpty, "tableName must be non-empty")

  /** `schema.tableName` (reference: config.py:24-29). */
  def qualifiedName: String = s"$schema.$tableName"
}
