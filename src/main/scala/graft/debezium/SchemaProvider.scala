package graft.debezium

import com.fasterxml.jackson.databind.ObjectMapper

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import scala.collection.concurrent.TrieMap

/** Source of Avro schemas by registry id.
  *
  * The reference couples schema lookup to a live Confluent Schema
  * Registry HTTP client (reference: utils.py:11-21); here the lookup is
  * a seam so production uses [[HttpSchemaRegistry]] while tests inject
  * an [[InMemorySchemaProvider]].
  */
trait SchemaProvider {

  /** Avro schema JSON for a registry id. Must be cached/cheap — it is
    * called per (key_schema_id, value_schema_id) pair per micro-batch
    * on the driver (reference: stream.py:68-78).
    */
  def schemaJson(id: Int): String
}

final class InMemorySchemaProvider(schemas: Map[Int, String]) extends SchemaProvider {
  override def schemaJson(id: Int): String =
    schemas.getOrElse(id, throw new NoSuchElementException(s"no schema registered for id $id"))
}

/** Minimal Confluent Schema Registry client: `GET
  * {base}/schemas/ids/{id}` -> `{"schema": "<avro json>"}`, with an
  * in-memory cache (registry ids are immutable, so cache-forever is
  * sound — mirrors the confluent client's caching, stream.py:74).
  */
final class HttpSchemaRegistry(baseUrl: String) extends SchemaProvider {
  private val cache = TrieMap.empty[Int, String]
  private lazy val client = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  override def schemaJson(id: Int): String =
    cache.getOrElseUpdate(id, fetch(id))

  private def fetch(id: Int): String = {
    val req = HttpRequest
      .newBuilder(URI.create(s"${baseUrl.stripSuffix("/")}/schemas/ids/$id"))
      .GET()
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(s"schema registry returned ${resp.statusCode()} for id $id")
    mapper.readTree(resp.body()).get("schema").asText()
  }
}
