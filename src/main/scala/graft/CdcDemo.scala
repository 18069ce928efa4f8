package graft

import graft.avro.AvroBinary
import graft.config.TableConfig
import graft.debezium.InMemorySchemaProvider
import graft.operators.MergeEngine
import graft.streaming.{GraftStreamingListener, KafkaRecord, MemoryCdcSource, StreamPipeline}

import org.apache.spark.sql.SparkSession

import java.sql.Timestamp

/** Executable end-to-end CDC demo: synthesizes Confluent-framed Avro
  * change events (insert -> update -> stale replay -> delete), streams
  * them through [[StreamPipeline]], and prints the replicated table
  * after each micro-batch.
  *
  * Run: `sbt "runMain graft.CdcDemo"`.
  */
object CdcDemo {

  private val KeySchema =
    """{"type":"record","name":"users_key","fields":[{"name":"id","type":"int"}]}"""
  private val ValueSchema =
    """{"type":"record","name":"users","fields":[
      |{"name":"id","type":"int"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"__deleted","type":["null","string"],"default":null},
      |{"name":"__log_sequence_number","type":["null","long"],"default":null}
      |]}""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-cdc-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("cdc-demo").toString
    val topic = "pg.public.users"
    val cfg = TableConfig("demo", "users", s"$base/users")
    val provider = new InMemorySchemaProvider(Map(1 -> KeySchema, 10 -> ValueSchema))
    val listener = new GraftStreamingListener
    spark.streams.addListener(listener)

    var offset = 0L
    def rec(id: Int, name: String, lsn: Long, deleted: Boolean = false): KafkaRecord = {
      offset += 1
      KafkaRecord(topic, 0, offset, new Timestamp(1700000000000L + lsn), 0,
        AvroBinary.confluentMessage(1, KeySchema, Map("id" -> id)),
        AvroBinary.confluentMessage(10, ValueSchema, Map(
          "id" -> id, "name" -> name,
          "__deleted" -> (if (deleted) "true" else "false"),
          "__log_sequence_number" -> lsn)))
    }

    val source = new MemoryCdcSource(spark)
    val query = StreamPipeline.streamToTable(
      spark, "cdc-demo", source, Map(topic -> cfg), s"$base/ckpt", provider)

    def show(label: String): Unit = {
      println(s"== $label ==")
      MergeEngine.readTable(spark, cfg.path) match {
        case Some(t) => t.orderBy("id").show(false)
        case None => println("(empty)")
      }
    }

    source.addRecords(Seq(rec(1, "ada", 10), rec(2, "grace", 11), rec(3, "edsger", 12)))
    query.processAllAvailable()
    show("after insert batch (3 rows)")

    source.addRecords(Seq(rec(2, "grace-hopper", 20), rec(3, "stale-name", 1)))
    query.processAllAvailable()
    show("after update batch (id=2 renamed; stale id=3 replay ignored)")

    source.addRecords(Seq(rec(1, "ada", 30, deleted = true)))
    query.processAllAvailable()
    show("after delete batch (id=1 removed)")

    println(s"rows processed by listener: ${listener.rowsProcessed}")
    query.stop()
    spark.stop()
  }
}
