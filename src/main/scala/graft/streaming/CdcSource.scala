package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** One Kafka-shaped CDC record (the schema `readStream.format("kafka")`
  * yields — reference: stream.py:196-218).
  */
final case class KafkaRecord(
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: Timestamp,
    timestampType: Int,
    key: Array[Byte],
    value: Array[Byte])

object KafkaRecord {
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("key", BinaryType),
    StructField("value", BinaryType)))
}

/** Pluggable streaming source seam. The reference hard-codes
  * `format("kafka")` (stream.py:196-204); behind this trait production
  * clusters use [[KafkaCdcSource]] unchanged while environments without
  * the kafka connector jar (like this one) stream the same record shape
  * from files or memory.
  */
trait CdcSource {
  def load(spark: SparkSession): DataFrame
}

/** The real thing: string-configured `format("kafka")` with the same
  * options the reference sets (subscribe list, startingOffsets,
  * failOnDataLoss — stream.py:196-204). Requires the
  * spark-sql-kafka connector jar on the cluster classpath.
  */
final case class KafkaCdcSource(
    bootstrapServers: String,
    topics: Seq[String],
    startingOffsets: String = "earliest",
    failOnDataLoss: Boolean = true) extends CdcSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()
}

/** File-backed CDC feed: parquet files of [[KafkaRecord]] rows dropped
  * into a directory become micro-batches.
  */
final case class FileCdcSource(dir: String) extends CdcSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream.schema(KafkaRecord.schema).parquet(dir)
}

/** In-process CDC feed over `MemoryStream` for tests: call
  * [[addRecords]], then process a trigger.
  */
final class MemoryCdcSource(spark: SparkSession) extends CdcSource {
  private val stream =
    MemoryStream[KafkaRecord](Encoders.product[KafkaRecord], spark.sqlContext)

  def addRecords(records: Seq[KafkaRecord]): Unit = { stream.addData(records); () }

  override def load(spark: SparkSession): DataFrame = stream.toDF()
}
