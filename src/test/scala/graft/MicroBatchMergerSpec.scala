package graft

import graft.config.TableConfig
import graft.debezium.InMemorySchemaProvider
import graft.streaming.MicroBatchMerger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Direct micro-batch merge loop behaviors not covered by the
  * stream-level E2E specs: auto-compaction cadence and the single-pass
  * routing of upsert/delete slices.
  */
class MicroBatchMergerSpec extends SparkSpec {
  import spark.implicits._

  private val Topic = "pg.public.users"
  private val provider = new InMemorySchemaProvider(Map(
    1 -> AvroTestData.usersKeySchema,
    10 -> AvroTestData.usersValueSchemaV1))

  private var offset = 0L

  /** An envelope-projected micro-batch (what projectEnvelope emits). */
  private def batchOf(rows: (Int, String, Long, Boolean)*): DataFrame =
    rows.map { case (id, name, lsn, deleted) =>
      offset += 1
      val value = AvroTestData.encode(AvroTestData.usersValueSchemaV1, Map[String, Any](
        "id" -> id, "name" -> name, "email" -> s"$name@x.com",
        "created_at" -> 19968, "updated_at" -> "2024-09-01T00:00:00Z",
        "__deleted" -> (if (deleted) "true" else "false"),
        "__timestamp" -> 1725148800000L, "__log_sequence_number" -> lsn))
      (Topic, 0, offset, new Timestamp(1725148800000L), 0, 1, 10, value)
    }.toDF("topic", "partition", "offset", "timestamp", "timestampType",
      "key_schema_id", "value_schema_id", "value_avro")

  private def dataFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().toSeq.filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName)
  }

  test("autoCompactEvery folds per-batch file growth inside the merge loop") {
    val path = tmpDir("mbm-compact")
    val cfg = TableConfig("graft_test", "mbm_compact", s"$path/t",
      additionalCols = Seq("YEAR(created_at) AS year"),
      partitionCols = Seq("year"),
      autoCompactEvery = 2)
    // 6 batches of fresh keys -> without compaction the 2024 partition
    // accumulates at least one file per batch
    (0 until 6).foreach { b =>
      val rows = (0 until 4).map(i => (b * 10 + i, s"n$b-$i", (b * 10 + i).toLong, false))
      MicroBatchMerger.process(batchOf(rows: _*), Map(Topic -> cfg), provider)
    }
    val files = dataFiles(s"$path/t/year=2024")
    assert(files.size <= 4, s"auto-compaction never ran: ${files.size} files")
    val t = graft.operators.MergeEngine.readTable(spark, cfg.path).get
    assert(t.count() == 24, "compaction must not lose rows")
  }

  test("mixed batch routes upserts and deletes in one pass; nulls drop") {
    val path = tmpDir("mbm-route")
    val cfg = TableConfig("graft_test", "mbm_route", s"$path/t")
    MicroBatchMerger.process(
      batchOf((1, "a", 1L, false), (2, "b", 2L, false), (3, "c", 3L, false)),
      Map(Topic -> cfg), provider)
    // batch 2: update 1, delete 2, insert 4
    MicroBatchMerger.process(
      batchOf((1, "a2", 10L, false), (2, "b", 11L, true), (4, "d", 12L, false)),
      Map(Topic -> cfg), provider)
    val out = graft.operators.MergeEngine.readTable(spark, cfg.path).get
      .select("id", "name").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a2", 3 -> "c", 4 -> "d"))
  }

  test("delete-only batch skips the upsert pass entirely (no table created)") {
    val path = tmpDir("mbm-delonly")
    val cfg = TableConfig("graft_test", "mbm_delonly", s"$path/t")
    // deletes against a table that does not exist yet: must be a no-op,
    // not a crash, and must not write any data files
    MicroBatchMerger.process(
      batchOf((9, "x", 1L, true)), Map(Topic -> cfg), provider)
    assert(graft.operators.MergeEngine.readTable(spark, cfg.path).isEmpty)
  }
}
