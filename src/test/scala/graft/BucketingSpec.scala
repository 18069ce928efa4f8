package graft

import graft.operators.Bucketing

import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without a shuffle") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    val facts = (1 to 10000).map(i => (i.toLong % 500, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 500L).map(k => (k, s"dim$k")).toDF("k", "name")

    // disable auto-broadcast so the test exercises the bucket path,
    // then restore
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(facts, "graft_test.b_facts", Seq("k"), 8, sortCols = Seq("k"))
      Bucketing.writeBucketed(dims, "graft_test.b_dims", Seq("k"), 8, sortCols = Seq("k"))

      val joined = Bucketing.bucketJoin(spark, "graft_test.b_facts", "graft_test.b_dims", Seq("k"))
      assert(joined.count() == 10000)
      assert(Bucketing.isShuffleFree(joined), "bucketed join still shuffled:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))

      // and a groupBy on the bucket key needs no exchange either
      val agg = spark.table("graft_test.b_facts").groupBy("k").agg(sum("v"))
      assert(agg.count() == 500)
      assert(Bucketing.isShuffleFree(agg), "bucketed groupBy still shuffled")

      // sanity: the same join on plain (unbucketed) frames DOES shuffle
      assert(!Bucketing.isShuffleFree(facts.join(dims, Seq("k"))))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_test.b_facts")
      spark.sql("DROP TABLE IF EXISTS graft_test.b_dims")
    }
  }

  test("incremental exact dedup against a BUCKETED store shuffles only the increment") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    val corpus = (1 to 2000)
      .map(i => (i.toLong, s"document body number ${i % 700} with shared tail"))
      .toDF("doc_id", "text")
    val storeFps = corpus.select(
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp")).distinct()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the store lives bucketed by fp — the anti-join probe then reads
      // it co-located: the ONLY hash exchange left is the (small)
      // increment's own groupBy/shuffle, never O(store)
      Bucketing.writeBucketed(storeFps, "graft_test.b_store_fps", Seq("fp"), 8,
        sortCols = Seq("fp"))
      val incoming = Seq(
        (9001L, "document body number 1 with shared tail"), // store dup
        (9002L, "a brand new never seen before document"))
        .toDF("doc_id", "text")
      val survivors = graft.operators.TextDedup.exactSurvivorsAgainstStore(
        incoming, spark.table("graft_test.b_store_fps"), "doc_id", "text")
      assert(survivors.select("id").as[Long].collect().toSeq == Seq(9002L))
      val plan = survivors.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 1, s"store side shuffled too ($exchanges exchanges):\n${plan.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_test.b_store_fps")
    }
  }
}
