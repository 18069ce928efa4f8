package graft.streaming

import graft.avro.{AvroDecode, AvroSchemas}
import graft.config.TableConfig
import graft.debezium.{DebeziumCast, SchemaProvider}
import graft.operators.{CdcDedup, MergeEngine}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The micro-batch merge closure — the engine's core control flow,
  * with the same SEMANTICS as the reference's driver-orchestrated loop
  * (reference: stream.py:39-156, traced in SURVEY.md §3.2) but fewer
  * fixed per-batch jobs:
  *
  * cache batch -> ONE distinct (topic, key_schema_id, value_schema_id)
  * metadata collect (the reference runs a topics pass plus a pairs
  * pass per topic) -> per topic, pairs in ascending registry order
  * (older schema versions merge first — ids are monotone; the topic
  * slice is additionally cached only when several pairs will re-read
  * it) -> per pair: pk cols from the key schema, FAILFAST Avro decode,
  * struct expansion, Debezium casts, W1 latest-per-key dedup,
  * additional cols, memoized create-table, ONE routing aggregation
  * (replacing two per-branch emptiness probes AND the merge's
  * upsert-touched partition collect), upsert the live slice (strict
  * LSN guard), delete the tombstone slice (pk-only, no guard).
  */
object MicroBatchMerger {

  val DefaultDeletedCol = "__deleted"
  val DefaultVersionCol = "__log_sequence_number"

  /** Per-(application, table) memo of [[MergeEngine.createTableIfNotExists]]:
    * the ensure is idempotent DDL, so after the first success per session
    * the two catalog roundtrips per micro-batch are pure fixed cost.
    */
  private val ensuredTables = new graft.util.SessionScopedCache[Boolean]

  /** Per-(application, table) processed-batch counter driving
    * [[TableConfig.autoCompactEvery]].
    */
  private val batchCounters =
    new graft.util.SessionScopedCache[java.util.concurrent.atomic.AtomicLong]

  /** @param failFast true (reference parity): a malformed Avro payload
    *                  fails the batch (and so the query). false:
    *                  PERMISSIVE — malformed payloads decode to null
    *                  and are dropped, the stream keeps running.
    */
  def process(
      batch: DataFrame,
      configs: Map[String, TableConfig],
      provider: SchemaProvider,
      deletedCol: String = DefaultDeletedCol,
      versionCol: String = DefaultVersionCol,
      failFast: Boolean = true): Unit = {
    val spark = batch.sparkSession
    batch.cache()
    try {
      // ONE metadata job for the whole batch: the reference runs a
      // distinct-topics pass plus a distinct-schema-pairs pass per
      // topic; collecting (topic, key_id, value_id) once gives the same
      // driver-side plan with topics-many fewer jobs — pure fixed cost
      // at small batch sizes.
      val meta = batch
        .select("topic", "key_schema_id", "value_schema_id")
        .distinct()
        .collect()
      meta.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (topic, rows) =>
        configs.get(topic).foreach { cfg =>
          // older schema versions merge first — registry ids are monotone
          val pairs = rows.map(r => (r.getInt(1), r.getInt(2))).sortBy { case (k, v) => (v, k) }
          // the slice cache (S7) only pays for itself when several
          // schema pairs re-read the same topic's rows; a single-pair
          // topic reads straight from the cached batch
          val current =
            if (pairs.length > 1) batch.filter(col("topic") === topic).cache() else batch
          try {
            pairs.foreach { case (keyId, valueId) =>
              val keyJson = provider.schemaJson(keyId)
              val valueJson = provider.schemaJson(valueId)
              val pkCols = AvroSchemas.fieldNames(keyJson)

              val slice = current
                .filter(col("topic") === topic)
                .filter(col("key_schema_id") === keyId)
                .filter(col("value_schema_id") === valueId)
              val raw = slice
                .select(
                  AvroDecode.fromAvro(col("value_avro"), valueJson, failFast = failFast)
                    .as("value"))
              val decoded = (if (failFast) raw else raw.filter(col("value").isNotNull))
                .select(col("value.*"))
                .select(DebeziumCast.castColumns(valueJson): _*)

              val deduped = CdcDedup.latestPerKeyAgg(decoded, pkCols, versionCol)
              val withAdditional =
                (if (cfg.additionalCols.isEmpty) deduped
                 else deduped.select(deduped.columns.map(col).toSeq ++ cfg.additionalCols.map(expr): _*))
                  .cache() // consumed 3x: routing stats + up to two merges

              try {
                val targetSchema =
                  StructType(withAdditional.schema.filterNot(_.name == deletedCol))
                ensuredTables.getOrElseUpdate(spark, cfg.qualifiedName) {
                  MergeEngine.createTableIfNotExists(spark, targetSchema, cfg); true
                }

                // ONE routing + partition-discovery job: per-(branch,
                // partition) counts replace the two per-branch emptiness
                // probes AND the merge's upsert-touched partition collect
                // (null __deleted rows route to neither branch). Row
                // cardinality is branches x touched partitions — driver-
                // bounded by construction.
                val partCols = cfg.partitionCols
                val routed = withAdditional
                  .groupBy(
                    (col(deletedCol) === "true").as("__is_del") +: partCols.map(col): _*)
                  .count()
                  .collect()
                def n(del: Boolean) = routed
                  .filter(r => !r.isNullAt(0) && r.getBoolean(0) == del)
                  .map(_.getLong(partCols.size + 1)).sum
                // the distinct partition values of the upsert branch, in
                // the positional Row shape MergeEngine's partition
                // predicate consumes
                val touchedUpsert =
                  if (partCols.isEmpty) None
                  else Some(routed
                    .filter(r => !r.isNullAt(0) && !r.getBoolean(0))
                    .map(r => org.apache.spark.sql.Row
                      .fromSeq((1 to partCols.size).map(r.get)))
                    .distinct)

                val upserts = withAdditional.filter(col(deletedCol) =!= "true").drop(deletedCol)
                val deletes = withAdditional.filter(col(deletedCol) === "true")
                if (n(false) > 0 && n(true) > 0)
                  // mixed batch: ONE read-modify-write transaction
                  MergeEngine.merge(spark, cfg, upserts, deletes, pkCols, versionCol,
                    knownBothNonEmpty = true, touchedUpsert = touchedUpsert)
                else if (n(false) > 0)
                  MergeEngine.upsert(spark, cfg, upserts, pkCols, versionCol,
                    knownNonEmpty = true, touchedUpsert = touchedUpsert)
                else if (n(true) > 0)
                  MergeEngine.delete(spark, cfg, deletes, pkCols, knownNonEmpty = true)
              } finally { withAdditional.unpersist(); () }
            }
            if (cfg.autoCompactEvery > 0) {
              val n = batchCounters
                .getOrElseUpdate(spark, cfg.qualifiedName)(new java.util.concurrent.atomic.AtomicLong)
                .incrementAndGet()
              if (n % cfg.autoCompactEvery == 0) { MergeEngine.compact(spark, cfg); () }
            }
          } finally { if (current ne batch) { current.unpersist(); () } }
        }
      }
    } finally { batch.unpersist(); () }
  }
}
