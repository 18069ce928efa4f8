package graft

import graft.functions.DeterministicSample
import graft.operators.Sampling

import org.apache.spark.sql.functions._

class DeterministicSampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 5000).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")

  test("agrees with the window-based samplePerGroup definition") {
    val viaAgg = df
      .repartition(16) // force partial buffers + merge
      .groupBy("g")
      .agg(DeterministicSample(col("id"), 7).as("sample"))
      .select(col("g"), explode(col("sample")).as("id"))
      .as[(String, Long)].collect().toSet
    val viaWindow = Sampling.samplePerGroup(df, Seq("g"), Seq("id"), 7)
      .as[(String, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.groupBy(_._1).forall(_._2.size == 7))
  }

  test("portable md5 rank agrees with the window sampler on the same rank") {
    val md5Rank =
      conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long")
    val viaAgg = df
      .repartition(16)
      .groupBy("g")
      .agg(DeterministicSample(col("id"), 7, portableRank = true).as("sample"))
      .select(col("g"), explode(col("sample")).as("id"))
      .as[(String, Long)].collect().toSet
    val viaWindow = Sampling.samplePerGroup(df, Seq("g"), Seq("id"), 7, hash = Some(md5Rank))
      .as[(String, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    // and the two rank families really are different samples
    val viaDefault = df.groupBy("g")
      .agg(DeterministicSample(col("id"), 7).as("sample"))
      .select(col("g"), explode(col("sample")).as("id"))
      .as[(String, Long)].collect().toSet
    assert(viaAgg != viaDefault)
  }

  test("string values, nulls skipped, buffer bounded") {
    val sdf = Seq(Some("a"), Some("b"), None, Some("c"), Some("d")).toDF("s")
    val out = sdf.agg(DeterministicSample(col("s"), 3).as("sample"))
      .select(size(col("sample"))).as[Int].collect().head
    assert(out == 3)
  }

  test("SQL registration: deterministic_sample") {
    GraftFunctions.registerAll(spark)
    df.createOrReplaceTempView("ds_in")
    val n = spark.sql("SELECT g, deterministic_sample(id, 4) AS s FROM ds_in GROUP BY g")
      .select(size(col("s"))).as[Int].collect()
    assert(n.length == 3 && n.forall(_ == 4))
  }
}
