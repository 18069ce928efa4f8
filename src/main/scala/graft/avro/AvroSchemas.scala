package graft.avro

import org.apache.avro.Schema
import org.apache.spark.sql.avro.SchemaConverters
import org.apache.spark.sql.types.{DataType, StructType}

import scala.jdk.CollectionConverters._

/** Avro JSON-schema utilities.
  *
  * The conversion to Spark types is delegated to Spark's own
  * `SchemaConverters` (the avro module ships inside spark-sql in
  * Spark 4.x), which covers the full type lattice the reference's
  * schemas exercise (reference: utils/test/avro_schema.py:1-32):
  * primitives, `["null", T]` unions -> nullable fields, logical
  * `date` -> DateType, logical decimals -> DecimalType.
  */
object AvroSchemas {

  def parse(json: String): Schema = new Schema.Parser().parse(json)

  def toDataType(schema: Schema): DataType = SchemaConverters.toSqlType(schema).dataType

  /** Spark StructType for an Avro record schema. */
  def toStructType(json: String): StructType =
    toDataType(parse(json)).asInstanceOf[StructType]

  /** Top-level field names of a record schema. For a CDC key schema
    * these are the merge key columns (reference: utils.py:24-34).
    */
  def fieldNames(json: String): Seq[String] =
    parse(json).getFields.asScala.map(_.name).toSeq
}
