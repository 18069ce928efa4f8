package graft

import graft.sources.FileManifest
import graft.streaming.StreamIngest

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** A manifest maintained inside a streaming foreachBatch must equal a
  * full rebuild after any number of micro-batches, and serve pruned
  * reads between them.
  */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch ingest keeps the manifest equal to a full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("stream-ingest")
    val table = s"$root/t"; val mpath = s"$root/m"
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("a", "b").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamIngest.appendWithManifest(
          batch.repartitionByRange(2, col("a")).sortWithinPartitions(col("a")),
          table, mpath, Seq("a", "b"))
        ()
      }
      .start()
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.map(String.valueOf)).toSet
      in.addData((0L until 100L).map(v => (v, v % 7)): _*); q.processAllAvailable()
      assert(rows(FileManifest.loadManifest(spark, mpath)) ==
        rows(FileManifest.build(spark, table, Seq("a", "b"))),
        "manifest diverged after batch 1")
      in.addData((100L until 200L).map(v => (v, v % 7)): _*); q.processAllAvailable()
      in.addData((200L until 300L).map(v => (v, v % 7)): _*); q.processAllAvailable()
      val maintained = FileManifest.loadManifest(spark, mpath)
      assert(rows(maintained) == rows(FileManifest.build(spark, table, Seq("a", "b"))),
        "manifest diverged after batch 3")
      // the maintained manifest serves a pruned read mid-stream
      val pruned = FileManifest.readPruned(spark, maintained, "a", 120L, 180L)
      assert(pruned.count() == 61L)
      // and pruning actually skips files: each batch wrote 2 range
      // files, only batch 2's cover [120, 180]
      val kept = FileManifest.pruneFiles(maintained, "a", 120L, 180L).count()
      val total = maintained.select(col("file")).distinct().count()
      assert(kept < total, s"pruning skipped nothing: $kept of $total")
    } finally q.stop()
  }
}
