package graft

import graft.avro.AvroEncode
import graft.config.TableConfig
import graft.debezium.InMemorySchemaProvider
import graft.functions.ConfluentWire
import graft.operators.MergeEngine
import graft.streaming.MicroBatchMerger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CDC ingest throughput bench: synthesizes Confluent-framed Debezium
  * events from the testdata events table, then drives the REAL
  * micro-batch merge path (decode -> cast -> dedup -> guarded merge ->
  * partitioned parquet) and reports events/second.
  *
  * The reference publishes no throughput numbers (BASELINE.md); its
  * stack pays a Python-UDF round trip per batch for envelope handling
  * plus Delta MERGE per topic. This measures our whole pipeline
  * (encode cost excluded — producers pay that in real deployments).
  *
  * Run: `sbt "runMain graft.CdcBench [sfDir] [batches]"`.
  */
object CdcBench {

  private val KeySchema =
    """{"type":"record","name":"ek","fields":[{"name":"user_id","type":"long"}]}"""
  private val ValueSchema =
    """{"type":"record","name":"ev","fields":[
      |{"name":"user_id","type":"long"},
      |{"name":"event_id","type":"long"},
      |{"name":"event_type","type":["null","string"],"default":null},
      |{"name":"value","type":"double"},
      |{"name":"bucket","type":"int"},
      |{"name":"__deleted","type":["null","string"],"default":null},
      |{"name":"__log_sequence_number","type":"long"}
      |]}""".stripMargin

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val multiplier = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("cdc-bench").toString
    val topic = "bench.public.events"
    val cfg = TableConfig("graft_bench", s"events_${System.nanoTime()}", s"$base/t",
      partitionCols = Seq("bucket"))
    val provider = new InMemorySchemaProvider(Map(1 -> KeySchema, 10 -> ValueSchema))

    // Pre-materialize framed batches (encode excluded from timing).
    // multiplier replicates the events table with disjoint key/version
    // ranges to measure throughput at bigger batch sizes.
    val ev0 = graft.sources.Tables(spark, sfDir, "events")
    val ev =
      if (multiplier == 1) ev0
      else ev0.crossJoin(spark.range(multiplier).select(col("id").as("rep")))
        .withColumn("event_id", col("event_id") * multiplier + col("rep"))
        .withColumn("user_id", col("user_id") + col("rep") * 1000L)
        .drop("rep")
    val framedBatches = (0 until batches).map { b =>
      val slice = ev.filter(col("event_id") % batches === b)
      val keyStruct = struct(col("user_id"))
      val valueStruct = struct(
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        (col("user_id") % 8).cast("int").as("bucket"),
        when(col("event_type") === "error", lit("true")).otherwise(lit("false")).as("__deleted"),
        col("event_id").as("__log_sequence_number"))
      val framed = slice
        .repartition(cpus.toInt)
        .select(
          lit(topic).as("topic"), lit(0).as("partition"), col("event_id").as("offset"),
          col("ts").as("timestamp"), lit(0).as("timestampType"),
          ConfluentWire.frame(1, AvroEncode.toAvroColumn(keyStruct, KeySchema)).as("key"),
          ConfluentWire.frame(10, AvroEncode.toAvroColumn(valueStruct, ValueSchema)).as("value"))
      framed.cache()
      val n = framed.count() // materialize before timing
      (framed, n)
    }
    val totalEvents = framedBatches.map(_._2).sum

    val t0 = System.nanoTime()
    framedBatches.foreach { case (framed, _) =>
      val projected = graft.streaming.StreamPipeline.projectEnvelope(framed)
      MicroBatchMerger.process(projected, Map(topic -> cfg), provider)
    }
    val sec = (System.nanoTime() - t0) / 1e9

    val rows = MergeEngine.readTable(spark, cfg.path).get.count()
    println(f"""{"metric":"cdc_events_per_sec","value":${totalEvents / sec}%.1f,"events":$totalEvents,"batches":$batches,"seconds":$sec%.2f,"final_rows":$rows}""")
    spark.stop()
  }
}
