package graft

import graft.avro.{AvroDecode, AvroEncode, AvroSchemas}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val richSchema =
    """{"type":"record","name":"rich","fields":[
      |{"name":"id","type":"long"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"scores","type":{"type":"array","items":"double"}},
      |{"name":"tags","type":{"type":"map","values":"string"}},
      |{"name":"day","type":{"type":"int","logicalType":"date"}}
      |]}""".stripMargin

  test("AvroEncode -> AvroDecode round-trips the full type lattice") {
    val df = Seq(
      (1L, Option("alice"), Seq(1.5, 2.5), Map("a" -> "x"), java.sql.Date.valueOf("2024-09-02")),
      (2L, Option.empty[String], Seq.empty[Double], Map.empty[String, String],
        java.sql.Date.valueOf("1999-12-31")))
      .toDF("id", "name", "scores", "tags", "day")
    val encoded = df.select(
      AvroEncode.toAvroColumn(
        struct(col("id"), col("name"), col("scores"), col("tags"), col("day")),
        richSchema).as("bin"))
    assert(encoded.schema("bin").dataType == BinaryType)
    val back = encoded
      .select(AvroDecode.fromAvro(col("bin"), richSchema).as("v"))
      .select(col("v.*"))
      .orderBy(col("id"))
      .collect()
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "alice")
    assert(back(0).getSeq[Double](2) == Seq(1.5, 2.5))
    assert(back(0).getMap[String, String](3) == Map("a" -> "x"))
    assert(back(0).getDate(4).toString == "2024-09-02")
    assert(back(1).isNullAt(1) && back(1).getSeq[Double](2).isEmpty)
    assert(back(1).getDate(4).toString == "1999-12-31")
  }

  test("AvroEncode bytes decode with the plain Java Avro reader (wire compat)") {
    val bytes = Seq(Tuple1(5L)).toDF("id")
      .select(AvroEncode.toAvroColumn(struct(col("id")),
        """{"type":"record","name":"k","fields":[{"name":"id","type":"long"}]}""").as("b"))
      .collect().head.getAs[Array[Byte]](0)
    val schema = AvroSchemas.parse(
      """{"type":"record","name":"k","fields":[{"name":"id","type":"long"}]}""")
    val reader = new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord](schema)
    val rec = reader.read(null, org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, null))
    assert(rec.get("id") == 5L)
  }

  test("SQL avro_encode round trip") {
    GraftFunctions.registerAll(spark)
    val ks = AvroTestData.usersKeySchema
    Seq(Tuple1(11)).toDF("id").createOrReplaceTempView("enc_in")
    val r = spark.sql(
      s"SELECT avro_decode(avro_encode(struct(id), '$ks'), '$ks').id AS id FROM enc_in")
      .collect().head
    assert(r.getInt(0) == 11)
  }
}
