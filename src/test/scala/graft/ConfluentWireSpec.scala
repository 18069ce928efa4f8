package graft

import graft.functions.ConfluentWire

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ConfluentWireSpec extends SparkSpec {

  private def wireDf(rows: Seq[(Array[Byte], Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v) => Row(k, v) }),
      schema)
  }

  test("schema id: 4-byte big-endian int from bytes [1,5)") {
    val payload = "payload".getBytes("UTF-8")
    val df = wireDf(Seq(
      (AvroTestData.frame(1, payload), AvroTestData.frame(42, payload)),
      (AvroTestData.frame(100042, payload), AvroTestData.frame(Int.MaxValue, payload))))
    val got = df.select(
      ConfluentWire.schemaId(col("key")).as("k"),
      ConfluentWire.schemaId(col("value")).as("v")).collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 42), (100042, Int.MaxValue)))
  }

  test("schema id: null input yields null (reference udf.py:12)") {
    val df = wireDf(Seq((null, AvroTestData.frame(7, Array[Byte](1)))))
    val r = df.select(ConfluentWire.schemaId(col("key")).as("id")).collect().head
    assert(r.isNullAt(0))
  }

  test("payload: bytes [5,..) and null -> EMPTY bytes (reference udf.py:23)") {
    val payload = Array[Byte](9, 8, 7)
    val df = wireDf(Seq(
      (AvroTestData.frame(5, payload), null),
      (AvroTestData.frame(5, Array.empty[Byte]), AvroTestData.frame(6, payload))))
    val got = df.select(
      ConfluentWire.avroPayload(col("key")).as("k"),
      ConfluentWire.avroPayload(col("value")).as("v")).collect()
    // row 0: key payload extracted; null value -> empty (not null)
    assert(got(0).getAs[Array[Byte]]("k").toSeq == payload.toSeq)
    assert(got(0).getAs[Array[Byte]]("v").toSeq == Seq.empty)
    // row 1: zero-length payload -> empty; value payload extracted
    assert(got(1).getAs[Array[Byte]]("k").toSeq == Seq.empty)
    assert(got(1).getAs[Array[Byte]]("v").toSeq == payload.toSeq)
  }

  test("frame() column builder round-trips through schemaId/avroPayload") {
    val df = spark.range(1).select(ConfluentWire.frame(77, lit("abc".getBytes("UTF-8"))).as("m"))
    val r = df.select(
      ConfluentWire.schemaId(col("m")).as("id"),
      ConfluentWire.avroPayload(col("m")).cast(StringType).as("p")).collect().head
    assert(r.getInt(0) == 77 && r.getString(1) == "abc")
  }
}
