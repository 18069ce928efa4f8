package graft

import graft.operators.QuantileSketch
import graft.streaming.StreamQuantiles

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Sketches absorbed per micro-batch must equal one batch build over
  * everything the stream carried, and serve mid-stream quantile reads.
  */
class StreamQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val m = 7

  test("stream absorb across batches == batch build over the union") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("stream-quantiles")
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("k", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamQuantiles.absorbBatch(batch, Seq("k"), col("v"), m, path,
          prefixBuckets = 8)
        ()
      }
      .start()
    val rnd = new scala.util.Random(5)
    val batches = (1 to 3).map(_ =>
      (1 to 400).map(i => (s"k${i % 3}", math.abs(rnd.nextLong()) % 900000L + 1)))
    try {
      in.addData(batches(0): _*); q.processAllAvailable()
      // mid-stream read works after the bootstrap batch
      val mid = StreamQuantiles.quantilesFromStore(spark, path,
        Seq(("p50", 1, 2))).collect()
      assert(mid.length == 3 && mid.forall(_.getLong(1) > 0L))
      in.addData(batches(1): _*); q.processAllAvailable()
      in.addData(batches(2): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = QuantileSketch.load(spark, path).sketch.drop("__kp")
      .orderBy(col("k"), col("__qb")).as[(String, Long, Long)].collect().toSeq
    val rebuilt = QuantileSketch
      .build(batches.flatten.toDF("k", "v"), Seq("k"), col("v"), m)
      .orderBy(col("k"), col("__qb")).as[(String, Long, Long)].collect().toSeq
    assert(streamed == rebuilt)
    // and the quantiles the store answers equal the batch sketch's
    val qs = Seq(("p50", 1, 2), ("p95", 19, 20))
    val fromStore = StreamQuantiles.quantilesFromStore(spark, path, qs)
      .orderBy(col("k")).as[(String, Long, Long)].collect().toSeq
    val fromBatch = QuantileSketch.quantiles(
        QuantileSketch.build(batches.flatten.toDF("k", "v"), Seq("k"), col("v"), m),
        Seq("k"), qs)
      .orderBy(col("k")).as[(String, Long, Long)].collect().toSeq
    assert(fromStore == fromBatch)
  }

  test("empty batches are skipped without touching the store") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("stream-quantiles-empty")
    val empty = spark.emptyDataset[(String, Long)].toDF("k", "v")
    assert(StreamQuantiles.absorbBatch(
      empty, Seq("k"), col("v"), m, path) == 0L)
    val p = new org.apache.hadoop.fs.Path(s"$path/meta")
    assert(!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
  }
}
