package graft

import graft.avro.AvroBinary

/** CDC test schemas + thin aliases over [[graft.avro.AvroBinary]]. */
object AvroTestData {

  /** CDC key schema for the `users` test table (pk = id). */
  val usersKeySchema: String =
    """{"type":"record","name":"users_key","fields":[{"name":"id","type":"int"}]}"""

  /** CDC value schema v1: typical Debezium flattened row — nullable
    * unions, an Avro logical date, a ZonedTimestamp string, and the
    * three Debezium metadata columns.
    */
  val usersValueSchemaV1: String =
    """{"type":"record","name":"users","fields":[
      |{"name":"id","type":"int"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"email","type":["null","string"],"default":null},
      |{"name":"created_at","type":["null",{"type":"int","logicalType":"date"}],"default":null},
      |{"name":"updated_at","type":["null",{"type":"string","connect.name":"io.debezium.time.ZonedTimestamp"}],"default":null},
      |{"name":"__deleted","type":["null","string"],"default":null},
      |{"name":"__timestamp","type":["null","long"],"default":null},
      |{"name":"__log_sequence_number","type":["null","long"],"default":null}
      |]}""".stripMargin

  /** v2 adds phone_number (schema evolution: ADD COLUMN). */
  val usersValueSchemaV2: String =
    """{"type":"record","name":"users","fields":[
      |{"name":"id","type":"int"},
      |{"name":"name","type":["null","string"],"default":null},
      |{"name":"email","type":["null","string"],"default":null},
      |{"name":"phone_number","type":["null","string"],"default":null},
      |{"name":"created_at","type":["null",{"type":"int","logicalType":"date"}],"default":null},
      |{"name":"updated_at","type":["null",{"type":"string","connect.name":"io.debezium.time.ZonedTimestamp"}],"default":null},
      |{"name":"__deleted","type":["null","string"],"default":null},
      |{"name":"__timestamp","type":["null","long"],"default":null},
      |{"name":"__log_sequence_number","type":["null","long"],"default":null}
      |]}""".stripMargin

  def encode(schemaJson: String, values: Map[String, Any]): Array[Byte] =
    AvroBinary.encode(schemaJson, values)

  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] =
    AvroBinary.confluentFrame(schemaId, payload)

  def message(schemaId: Int, schemaJson: String, values: Map[String, Any]): Array[Byte] =
    AvroBinary.confluentMessage(schemaId, schemaJson, values)
}
