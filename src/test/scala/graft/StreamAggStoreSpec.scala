package graft

import graft.operators.AggStore

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance from a STREAM: each
  * micro-batch folds into the saved AggStore via foreachBatch
  * absorb — after any sequence of batches the store must equal a
  * batch rebuild over everything ingested, element for element
  * (the monoid-fold argument; order of absorption is immaterial).
  */
class StreamAggStoreSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch absorb over micro-batches == batch rebuild over the union") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("stream-agg-store")
    // bootstrap the store from the initial batch (an all-empty store
    // has no parquet schema to load), then stream the rest in
    val b1 = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0))
    AggStore.save(AggStore.build(b1.toDF("k", "v"), Seq("k"), col("v")),
      Seq("k"), path, prefixBuckets = 8)

    val in = MemoryStream[(String, Double)]
    val q = in.toDF().toDF("k", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AggStore.absorbIntoSaved(batch.sparkSession, path, batch, col("v"))
      }
      .start()
    try {
      val b2 = Seq(("b", -1.0), ("c", 10.0))
      val b3 = Seq(("a", 0.5))
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b3: _*); q.processAllAvailable()

      val streamed = AggStore.load(spark, path).groups.drop("__kp")
        .select("k", "cnt", "sum_micro", "min_micro", "max_micro")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val rebuilt = AggStore.build((b1 ++ b2 ++ b3).toDF("k", "v"), Seq("k"), col("v"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(streamed == rebuilt)
      assert(streamed.map(_._1) == Set("a", "b", "c"))
    } finally q.stop()
  }
}
