package graft

import graft.streaming.{KafkaRecord, MemoryCdcSource, StreamAnalytics, WindowedAggs}

import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Wire-to-windows: framed Confluent-Avro change events decoded
  * in-stream and aggregated into event-time windows.
  */
class StreamAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val valueSchema =
    """{"type":"record","name":"m","fields":[
      |{"name":"id","type":"int"},
      |{"name":"amount","type":"double"},
      |{"name":"kind","type":["null","string"],"default":null},
      |{"name":"__deleted","type":["null","string"],"default":null},
      |{"name":"__timestamp","type":"long"},
      |{"name":"__log_sequence_number","type":"long"}
      |]}""".stripMargin
  private val keySchema =
    """{"type":"record","name":"mk","fields":[{"name":"id","type":"int"}]}"""

  private var off = 0L
  private def rec(id: Int, amount: Double, kind: String, tMin: Int): KafkaRecord = {
    off += 1
    val ms = 1700000400000L + tMin * 60000L
    KafkaRecord("t", 0, off, new Timestamp(ms), 0,
      AvroTestData.message(1, keySchema, Map("id" -> id)),
      AvroTestData.message(10, valueSchema, Map(
        "id" -> id, "amount" -> amount, "kind" -> kind,
        "__deleted" -> "false", "__timestamp" -> ms, "__log_sequence_number" -> off)))
  }

  test("decode Confluent-Avro in-stream and window by event time") {
    val source = new MemoryCdcSource(spark)
    val decoded = StreamAnalytics.decodedEvents(spark, source, valueSchema)
    val windowed = WindowedAggs.tumblingCounts(
      decoded, "event_time", Seq("kind"), "5 minutes", "10 minutes", valueCol = Some("amount"))
    val name = s"wirewin_${System.nanoTime()}"
    val q = windowed.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      source.addRecords(Seq(
        rec(1, 10.0, "buy", 0), rec(2, 5.0, "buy", 2), rec(3, 7.5, "sell", 3)))
      q.processAllAvailable()
      source.addRecords(Seq(rec(4, 1.0, "buy", 60))) // advance watermark
      q.processAllAvailable()
      val rows = spark.table(name).select("kind", "n", "total")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("buy", 2L, 15.0)), s"buy window missing: $rows")
      assert(rows.contains(("sell", 1L, 7.5)))
    } finally q.stop()
  }
}
