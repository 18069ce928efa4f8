package graft

import graft.operators.Sampling

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Mixture sampling on a STREAM: the operator is a stateless
  * hash-threshold filter (no RNG state, no aggregation), so the same
  * call that reweights a batch corpus reweights a live stream — and,
  * because membership is a pure function of (group, id), the stream
  * selects exactly the rows the batch run selects: an ingest pipeline
  * can sample in-stream and later re-derive the identical mixture from
  * the raw archive.
  */
class StreamSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("in-stream mixture sampling selects exactly the batch-selected rows") {
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "web" else "code"))
    val rates = Map("web" -> (1, 4), "code" -> (1, 1)) // downsample web 4x, keep code
    val batchKept = Sampling
      .mixtureSample(rows.toDF("id", "source"), "source", Seq("id"), rates)
      .select("id").as[Long].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = Sampling.mixtureSample(in.toDF.toDF("id", "source"), "source", Seq("id"), rates)
    val name = s"sms_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val (first, second) = rows.splitAt(120) // arrival order must not matter
      in.addData(first)
      q.processAllAvailable()
      in.addData(second)
      q.processAllAvailable()
      val streamKept = spark.table(name).select("id").as[Long].collect().toSet
      assert(streamKept == batchKept)
      // and the mixture is actually reweighted
      val bySource = spark.table(name).groupBy("source").count()
        .as[(String, Long)].collect().toMap
      assert(bySource("code") == 100L)
      assert(bySource("web") < 50L && bySource("web") > 5L)
    } finally q.stop()
  }
}
