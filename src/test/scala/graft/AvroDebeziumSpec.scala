package graft

import graft.avro.{AvroDecode, AvroSchemas}
import graft.debezium.{DebeziumCast, InMemorySchemaProvider}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroDebeziumSpec extends SparkSpec {

  test("Avro schema -> StructType covers the CDC type lattice") {
    val st = AvroSchemas.toStructType(AvroTestData.usersValueSchemaV1)
    assert(st("id").dataType == IntegerType && !st("id").nullable)
    assert(st("name").dataType == StringType && st("name").nullable)
    assert(st("created_at").dataType == DateType && st("created_at").nullable)
    // ZonedTimestamp arrives as a string; the cast happens in DebeziumCast
    assert(st("updated_at").dataType == StringType)
    assert(st("__log_sequence_number").dataType == LongType)
  }

  test("key schema field names define merge keys") {
    assert(AvroSchemas.fieldNames(AvroTestData.usersKeySchema) == Seq("id"))
  }

  test("DebeziumCast casts exactly the ZonedTimestamp columns") {
    val decodedSchema = AvroSchemas.toStructType(AvroTestData.usersValueSchemaV1)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "n", "e", java.sql.Date.valueOf("2024-03-01"),
          "2024-03-01T10:00:00Z", "false", 1L, 10L))),
      decodedSchema)
    val cast = df.select(DebeziumCast.castColumns(AvroTestData.usersValueSchemaV1): _*)
    assert(cast.schema("updated_at").dataType == TimestampType)
    assert(cast.schema("name").dataType == StringType)
    val ts = cast.select(col("updated_at").cast(StringType)).collect().head.getString(0)
    assert(ts == "2024-03-01 10:00:00")
  }

  test("golden decode: framed Confluent Avro -> from_avro -> typed row") {
    val msg = AvroTestData.message(10, AvroTestData.usersValueSchemaV1, Map(
      "id" -> 5,
      "name" -> "alice",
      "email" -> "alice@example.com",
      "created_at" -> 19968, // 2024-09-02 as days since epoch
      "updated_at" -> "2024-09-02T08:30:00Z",
      "__deleted" -> "false",
      "__timestamp" -> 1725264600000L,
      "__log_sequence_number" -> 1001L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(msg))),
      StructType(Seq(StructField("value", BinaryType))))
    val decoded = df
      .select(graft.functions.ConfluentWire.schemaId(col("value")).as("sid"),
        AvroDecode.fromAvro(graft.functions.ConfluentWire.avroPayload(col("value")),
          AvroTestData.usersValueSchemaV1).as("v"))
      .select(col("sid"), col("v.*"))
      .select(col("sid"), col("id"), col("name"), col("created_at"),
        col("updated_at"), col("__log_sequence_number"))
    val r = decoded.collect().head
    assert(r.getInt(0) == 10)
    assert(r.getInt(1) == 5)
    assert(r.getString(2) == "alice")
    assert(r.getDate(3).toString == "2024-09-02")
    assert(r.getString(4) == "2024-09-02T08:30:00Z")
    assert(r.getLong(5) == 1001L)
  }

  test("FAILFAST decode raises on corrupt payload") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Array[Byte](1, 2)))),
      StructType(Seq(StructField("p", BinaryType))))
    val bad = df.select(
      AvroDecode.fromAvro(col("p"), AvroTestData.usersValueSchemaV1, failFast = true))
    intercept[Exception] { bad.collect() }

    // PERMISSIVE mode yields null instead
    val permissive = df.select(
      AvroDecode.fromAvro(col("p"), AvroTestData.usersValueSchemaV1, failFast = false))
    assert(permissive.collect().head.isNullAt(0))
  }

  test("decimal logical type decodes to DecimalType (Debezium precise mode)") {
    val schema =
      """{"type":"record","name":"pay","fields":[
        |{"name":"id","type":"int"},
        |{"name":"amount","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}}
        |]}""".stripMargin
    // encode 12345.67 as unscaled big-endian bytes (1234567)
    val unscaled = java.math.BigInteger.valueOf(1234567L).toByteArray
    val payload = AvroTestData.encode(schema, Map(
      "id" -> 1, "amount" -> java.nio.ByteBuffer.wrap(unscaled)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(payload))),
      StructType(Seq(StructField("p", BinaryType))))
    val out = df.select(AvroDecode.fromAvro(col("p"), schema).as("v")).select(col("v.*"))
    assert(out.schema("amount").dataType == DecimalType(10, 2))
    val r = out.collect().head
    assert(r.getDecimal(1).toString == "12345.67")
  }

  test("InMemorySchemaProvider lookups") {
    val p = new InMemorySchemaProvider(Map(1 -> AvroTestData.usersKeySchema))
    assert(AvroSchemas.fieldNames(p.schemaJson(1)) == Seq("id"))
    intercept[NoSuchElementException] { p.schemaJson(99) }
  }
}
