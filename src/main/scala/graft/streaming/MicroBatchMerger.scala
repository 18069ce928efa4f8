package graft.streaming

import graft.avro.{AvroDecode, AvroSchemas}
import graft.config.TableConfig
import graft.debezium.{DebeziumCast, SchemaProvider}
import graft.operators.{CdcDedup, MergeEngine}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The micro-batch merge closure — the engine's core control flow,
  * reproducing the reference's driver-orchestrated multi-pass loop
  * exactly (reference: stream.py:39-156, traced in SURVEY.md §3.2):
  *
  * cache batch -> distinct topics -> per topic: cache slice, distinct
  * (key_schema_id, value_schema_id) pairs in ascending registry order
  * (older schema versions merge first — ids are monotone) -> per pair:
  * pk cols from the key schema, FAILFAST Avro decode, struct expansion,
  * Debezium casts, W1 latest-per-key dedup, additional cols, create
  * table if needed, upsert the live slice (strict LSN guard), delete
  * the tombstone slice (pk-only, no guard).
  */
object MicroBatchMerger {

  val DefaultDeletedCol = "__deleted"
  val DefaultVersionCol = "__log_sequence_number"

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
      val topics = batch.select("topic").distinct().collect().map(_.getString(0))
      topics.foreach { topic =>
        configs.get(topic).foreach { cfg =>
          val current = batch.filter(col("topic") === topic).cache()
          try {
            val pairs = current
              .select("key_schema_id", "value_schema_id")
              .distinct()
              .orderBy(asc("value_schema_id"), asc("key_schema_id"))
              .collect()
            pairs.foreach { pair =>
              val (keyId, valueId) = (pair.getInt(0), pair.getInt(1))
              val keyJson = provider.schemaJson(keyId)
              val valueJson = provider.schemaJson(valueId)
              val pkCols = AvroSchemas.fieldNames(keyJson)

              val slice = current
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
                  .cache() // consumed up to 4x: two emptiness probes + two merges

              try {
                val targetSchema =
                  StructType(withAdditional.schema.filterNot(_.name == deletedCol))
                MergeEngine.createTableIfNotExists(spark, targetSchema, cfg)

                val upserts = withAdditional.filter(col(deletedCol) =!= "true").drop(deletedCol)
                MergeEngine.upsert(spark, cfg, upserts, pkCols, versionCol)

                val deletes = withAdditional.filter(col(deletedCol) === "true")
                MergeEngine.delete(spark, cfg, deletes, pkCols)
              } finally { withAdditional.unpersist(); () }
            }
          } finally { current.unpersist(); () }
        }
      }
    } finally { batch.unpersist(); () }
  }
}
