package graft

import graft.avro.AvroDecode
import graft.debezium.HttpSchemaRegistry
import graft.functions.ConfluentWire

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** Live test of [[HttpSchemaRegistry]] against a loopback HTTP server
  * (JDK built-in, ephemeral port — no external dependency, no egress)
  * speaking the Confluent wire protocol: `GET /schemas/ids/{id}` ->
  * `{"schema": "<escaped avro json>"}` (reference: utils.py:11-21).
  */
class HttpSchemaRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  /** Serve `schemas` with a hit counter; 404 for unknown ids. */
  private def withRegistry[A](schemas: Map[Int, String])(f: (String, AtomicInteger) => A): A = {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val id = ex.getRequestURI.getPath.stripPrefix("/schemas/ids/").toInt
      schemas.get(id) match {
        case Some(schema) =>
          val node = mapper.createObjectNode()
          node.put("schema", schema) // jackson escapes the embedded JSON
          val body = mapper.writeValueAsBytes(node)
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        case None =>
          ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  test("fetches and unescapes the schema from the Confluent envelope") {
    withRegistry(Map(7 -> AvroTestData.usersKeySchema)) { (url, _) =>
      val reg = new HttpSchemaRegistry(url)
      assert(reg.schemaJson(7) == AvroTestData.usersKeySchema)
    }
  }

  test("caches forever: one HTTP round trip per id, ever") {
    withRegistry(Map(1 -> AvroTestData.usersKeySchema, 2 -> AvroTestData.usersValueSchemaV1)) {
      (url, hits) =>
        val reg = new HttpSchemaRegistry(url)
        (1 to 5).foreach(_ => reg.schemaJson(1))
        (1 to 5).foreach(_ => reg.schemaJson(2))
        assert(hits.get() == 2, s"expected 2 fetches for 2 ids, saw ${hits.get()}")
    }
  }

  test("cached ids survive the registry going away (ids are immutable)") {
    val reg = withRegistry(Map(3 -> AvroTestData.usersKeySchema)) { (url, _) =>
      val r = new HttpSchemaRegistry(url)
      r.schemaJson(3) // warm
      r
    }
    // server stopped; the cached id still resolves, an unknown one fails
    assert(reg.schemaJson(3) == AvroTestData.usersKeySchema)
    intercept[Exception](reg.schemaJson(99))
  }

  test("non-200 surfaces as an error naming the id") {
    withRegistry(Map.empty) { (url, _) =>
      val reg = new HttpSchemaRegistry(url)
      val e = intercept[IllegalStateException](reg.schemaJson(42))
      assert(e.getMessage.contains("404") && e.getMessage.contains("42"))
    }
  }

  test("end-to-end: registry-fetched schema decodes a framed CDC message") {
    withRegistry(Map(11 -> AvroTestData.usersKeySchema)) { (url, _) =>
      val reg = new HttpSchemaRegistry(url)
      val msg = AvroTestData.message(11, AvroTestData.usersKeySchema, Map("id" -> 123))
      val row = Seq(Tuple1(msg)).toDF("value")
        .select(
          ConfluentWire.schemaId(col("value")).as("sid"),
          col("value").as("v"))
        .collect().head
      val sid = row.getInt(0)
      assert(sid == 11)
      // driver-side lookup by the id extracted from the wire, like the
      // micro-batch loop (stream.py:68-78)
      val schema = reg.schemaJson(sid)
      val decoded = Seq(Tuple1(msg)).toDF("value")
        .select(AvroDecode.fromAvro(ConfluentWire.avroPayload(col("value")), schema).as("k"))
        .select(col("k.id")).as[Int].collect().head
      assert(decoded == 123)
    }
  }
}
