package graft

import graft.streaming.StreamEnrich

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static enrichment: every micro-batch joins the static
  * dimension; unmatched events survive a left join; the dimension
  * probe rides a broadcast hash join.
  */
class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dim = Seq(
    (1, "BUILDING", "EMEA"),
    (2, "MACHINERY", "APAC"))
    .toDF("cust_id", "segment", "region")

  test("left enrichment attaches dimension columns and keeps unmatched events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Int, Double)]
    val out = StreamEnrich.enrich(
      in.toDF.toDF("event_id", "cust_id", "amount"), dim, Seq("cust_id"))
    val name = s"sen_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData((10, 1, 5.0), (11, 2, 7.0))
      q.processAllAvailable()
      in.addData((12, 99, 9.0)) // no dimension row
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("event_id", "segment").as[(Int, Option[String])].collect().toMap
      assert(rows == Map(10 -> Some("BUILDING"), 11 -> Some("MACHINERY"), 12 -> None))
    } finally q.stop()
  }

  test("inner enrichment drops unmatched events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Int, Int, Double)]
    val out = StreamEnrich.enrich(
      in.toDF.toDF("event_id", "cust_id", "amount"), dim, Seq("cust_id"), joinType = "inner")
    val name = s"sei_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData((10, 1, 5.0), (12, 99, 9.0))
      q.processAllAvailable()
      val ids = spark.table(name).select("event_id").as[Int].collect().toSeq
      assert(ids == Seq(10))
    } finally q.stop()
  }

  test("derived-key enrichment joins on the computed expression") {
    implicit val sqlCtx = spark.sqlContext
    val buckets = Seq((0, "even"), (1, "odd")).toDF("bucket", "parity")
    val in = MemoryStream[Int]
    val out = StreamEnrich.enrichByExpr(
      in.toDF.toDF("n"), buckets, pmod(col("n"), lit(2)), "bucket")
    val name = s"sex_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(3, 4)
      q.processAllAvailable()
      val got = spark.table(name).select("n", "parity").as[(Int, String)].collect().toMap
      assert(got == Map(3 -> "odd", 4 -> "even"))
    } finally q.stop()
  }

  test("the dimension probe is a broadcast hash join in the batch plan") {
    // stream-static planning reuses the batch planner per micro-batch;
    // assert on the equivalent batch plan
    val batch = Seq((10, 1, 5.0)).toDF("event_id", "cust_id", "amount")
    val plan = StreamEnrich.enrich(batch, dim, Seq("cust_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe in:\n$plan")
  }
}
