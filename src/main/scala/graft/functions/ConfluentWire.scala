package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Confluent wire-format envelope extraction as *native* Column
  * expressions (fully codegen'd; no UDF, no serialization round-trip).
  *
  * Wire layout (public Confluent wire format; reference README.md:15-18,
  * src/kafka2delta/udf/udf.py:3-23):
  *   - byte 0: magic byte 0x00
  *   - bytes 1-4: schema id, 4-byte big-endian int
  *   - bytes 5..: Avro binary payload
  *
  * Null contracts preserved from the reference:
  *   - null key/value -> null schema id (udf.py:12)
  *   - null value -> empty byte array payload, NOT null (udf.py:23)
  */
object ConfluentWire {

  /** Schema-registry id from a Confluent-framed binary column:
    * bytes [1,5) interpreted as a big-endian signed 32-bit int.
    * Null input -> null (reference udf.py:12).
    *
    * Implemented as hex-string arithmetic over the 4 id bytes — stays
    * inside whole-stage codegen; `conv` handles the unsigned 32-bit
    * range and the final cast wraps to the signed int the registry uses.
    */
  def schemaId(c: Column): Column =
    conv(hex(substring(c, 2, 4)), 16, 10).cast("bigint").cast(IntegerType)

  /** Avro payload from a Confluent-framed binary column: bytes [5,..).
    * Null input -> empty byte array (reference udf.py:23).
    */
  def avroPayload(c: Column): Column = {
    val tail = c.substr(lit(6), greatest(length(c) - lit(5), lit(0)))
    coalesce(tail, lit(Array.empty[Byte]))
  }

  /** Frame a payload into the Confluent envelope (test/fixture helper;
    * inverse of [[schemaId]]/[[avroPayload]]).
    */
  def frame(schemaId: Int, payload: Column): Column = {
    val header = Array[Byte](
      0x00,
      ((schemaId >> 24) & 0xff).toByte,
      ((schemaId >> 16) & 0xff).toByte,
      ((schemaId >> 8) & 0xff).toByte,
      (schemaId & 0xff).toByte)
    concat(lit(header), payload)
  }
}
