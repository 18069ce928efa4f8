package graft

import graft.config.TableConfig
import graft.debezium.{HttpSchemaRegistry, InMemorySchemaProvider}
import graft.operators.MergeEngine
import graft.streaming.{FileCdcSource, KafkaRecord, MemoryCdcSource, StreamPipeline}

import org.apache.spark.sql.functions._

import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress
import java.sql.Timestamp

/** Multi-topic fan-out (reference T7), partitioned targets with derived
  * YEAR/MONTH additional columns (reference stream_test.py:108-110),
  * the file-backed CDC source, and the HTTP schema-registry client.
  */
class StreamFanoutSpec extends SparkSpec {
  import spark.implicits._

  private val UsersTopic = "pg.public.users"
  private val OrdersTopic = "pg.public.orders"

  private val ordersKeySchema =
    """{"type":"record","name":"orders_key","fields":[{"name":"id","type":"int"}]}"""
  private val ordersValueSchema =
    """{"type":"record","name":"orders","fields":[
      |{"name":"id","type":"int"},
      |{"name":"total","type":"double"},
      |{"name":"created_at","type":{"type":"int","logicalType":"date"}},
      |{"name":"__deleted","type":["null","string"],"default":null},
      |{"name":"__log_sequence_number","type":["null","long"],"default":null}
      |]}""".stripMargin

  private val provider = new InMemorySchemaProvider(Map(
    1 -> AvroTestData.usersKeySchema,
    10 -> AvroTestData.usersValueSchemaV1,
    2 -> ordersKeySchema,
    20 -> ordersValueSchema))

  private var offset = 0L

  private def userRec(id: Int, name: String, lsn: Long): KafkaRecord = {
    offset += 1
    KafkaRecord(UsersTopic, 0, offset, new Timestamp(1700000000000L + lsn), 0,
      AvroTestData.message(1, AvroTestData.usersKeySchema, Map("id" -> id)),
      AvroTestData.message(10, AvroTestData.usersValueSchemaV1, Map(
        "id" -> id, "name" -> name, "email" -> s"$name@x.io", "created_at" -> 19968,
        "__deleted" -> "false", "__log_sequence_number" -> lsn)))
  }

  private def orderRec(id: Int, total: Double, days: Int, lsn: Long): KafkaRecord = {
    offset += 1
    KafkaRecord(OrdersTopic, 0, offset, new Timestamp(1700000000000L + lsn), 0,
      AvroTestData.message(2, ordersKeySchema, Map("id" -> id)),
      AvroTestData.message(20, ordersValueSchema, Map(
        "id" -> id, "total" -> total, "created_at" -> days,
        "__deleted" -> "false", "__log_sequence_number" -> lsn)))
  }

  test("one stream fans out to N tables; orders table partitioned by derived year/month") {
    val base = tmpDir("fanout")
    val usersCfg = TableConfig("graft_test", s"users_f${System.nanoTime()}", s"$base/users")
    val ordersCfg = TableConfig("graft_test", s"orders_f${System.nanoTime()}", s"$base/orders",
      additionalCols = Seq("YEAR(created_at) AS year", "MONTH(created_at) AS month"),
      partitionCols = Seq("year", "month"))
    val source = new MemoryCdcSource(spark)
    val query = StreamPipeline.streamToTable(
      spark, s"fanout-${System.nanoTime()}", source,
      Map(UsersTopic -> usersCfg, OrdersTopic -> ordersCfg),
      s"$base/ckpt", provider)
    try {
      // 19968 = 2024-09-02; 19720 = 2023-12-29 -> two (year, month) partitions
      source.addRecords(Seq(
        userRec(1, "ada", 10), userRec(2, "grace", 11),
        orderRec(100, 9.99, 19968, 12), orderRec(101, 19.99, 19720, 13)))
      query.processAllAvailable()

      val users = MergeEngine.readTable(spark, usersCfg.path).get
      assert(users.count() == 2)
      val orders = MergeEngine.readTable(spark, ordersCfg.path).get
      assert(orders.count() == 2)
      assert(orders.schema.fieldNames.toSet.intersect(Set("year", "month")) == Set("year", "month"))
      val parts = orders.select("year", "month").as[(Int, Int)].collect().toSet
      assert(parts == Set((2024, 9), (2023, 12)))
      // physical layout is partitioned
      assert(new java.io.File(s"${ordersCfg.path}/year=2024/month=9").exists())
      // catalog stays consistent: registered table sees the new partitions
      assert(spark.table(ordersCfg.qualifiedName).count() == 2)

      // update one order in one partition; other partition untouched
      source.addRecords(Seq(orderRec(100, 49.99, 19968, 20)))
      query.processAllAvailable()
      val after = MergeEngine.readTable(spark, ordersCfg.path).get
      assert(after.filter(col("id") === 100).select("total").as[Double].collect().head == 49.99)
      assert(after.count() == 2)
    } finally query.stop()
  }

  test("FileCdcSource: parquet drops become micro-batches") {
    val base = tmpDir("filesrc")
    val feedDir = s"$base/feed"
    new java.io.File(feedDir).mkdirs()
    val cfg = TableConfig("graft_test", s"users_file${System.nanoTime()}", s"$base/users")
    val query = StreamPipeline.streamToTable(
      spark, s"file-${System.nanoTime()}", FileCdcSource(feedDir),
      Map(UsersTopic -> cfg), s"$base/ckpt", provider)
    try {
      Seq(userRec(1, "ada", 1), userRec(2, "grace", 2)).toDS()
        .write.mode("append").parquet(feedDir)
      query.processAllAvailable()
      assert(MergeEngine.readTable(spark, cfg.path).get.count() == 2)

      Seq(userRec(2, "grace-II", 10), userRec(3, "edsger", 11)).toDS()
        .write.mode("append").parquet(feedDir)
      query.processAllAvailable()
      val t = MergeEngine.readTable(spark, cfg.path).get
      assert(t.count() == 3)
      assert(t.filter(col("id") === 2).select("name").as[String].collect().head == "grace-II")
    } finally query.stop()
  }

  test("checkpoint recovery: restart from the same checkpoint, no duplicates") {
    val base = tmpDir("recovery")
    val feedDir = s"$base/feed"
    new java.io.File(feedDir).mkdirs()
    val cfg = TableConfig("graft_test", s"users_rec${System.nanoTime()}", s"$base/users")

    // session 1: process batch 1, then stop
    val q1 = StreamPipeline.streamToTable(
      spark, s"rec1-${System.nanoTime()}", FileCdcSource(feedDir),
      Map(UsersTopic -> cfg), s"$base/ckpt", provider)
    Seq(userRec(1, "ada", 1), userRec(2, "grace", 2)).toDS()
      .write.mode("append").parquet(feedDir)
    q1.processAllAvailable()
    q1.stop()
    assert(MergeEngine.readTable(spark, cfg.path).get.count() == 2)

    // session 2: same checkpoint; old files must NOT reprocess (offsets)
    // and even if they did, the merge is idempotent. New file applies.
    Seq(userRec(2, "grace-II", 10), userRec(3, "edsger", 11)).toDS()
      .write.mode("append").parquet(feedDir)
    val q2 = StreamPipeline.streamToTable(
      spark, s"rec2-${System.nanoTime()}", FileCdcSource(feedDir),
      Map(UsersTopic -> cfg), s"$base/ckpt", provider)
    try {
      q2.processAllAvailable()
      val t = MergeEngine.readTable(spark, cfg.path).get
      assert(t.count() == 3)
      assert(t.filter(col("id") === 2).select("name").as[String].collect().head == "grace-II")
    } finally q2.stop()
  }

  test("HttpSchemaRegistry fetches and caches schemas") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var hits = 0
    server.createContext("/schemas/ids/42", exchange => {
      hits += 1
      val body =
        s"""{"schema": "{\\"type\\":\\"record\\",\\"name\\":\\"k\\",\\"fields\\":[{\\"name\\":\\"id\\",\\"type\\":\\"int\\"}]}"}"""
      val bytes = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val registry = new HttpSchemaRegistry(s"http://localhost:${server.getAddress.getPort}")
      val json = registry.schemaJson(42)
      assert(graft.avro.AvroSchemas.fieldNames(json) == Seq("id"))
      registry.schemaJson(42)
      registry.schemaJson(42)
      assert(hits == 1, "registry responses must be cached")
      intercept[Exception] { registry.schemaJson(404) }
    } finally server.stop(0)
  }
}
