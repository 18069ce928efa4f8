package graft

import graft.operators.Packing

import org.apache.spark.sql.functions._

/** Token-balanced shard planning: the two-level prefix sum must equal
  * a single global running sum, cover every document exactly once,
  * and hold the provable per-shard token bound.
  */
class ShardPlanSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, 10L + rnd.nextInt(90)))
  }

  test("two-level plan == single global running sum reference") {
    val rows = fixture(3000, 7)
    val df = rows.toDF("id", "toks")
    val got = Packing.shardPlan(df, "id", col("toks"), budgetTokens = 1500L,
        orderBuckets = 16)
      .as[(Long, Long, Long)].collect().map { case (id, _, s) => (id, s) }.toMap
    // reference: exact sequential walk in (bucket, id) order, bucket
    // recomputed via Spark's own xxhash64 to match the default
    val bucketMap = df.select(col("id"),
        pmod(xxhash64(col("id")), lit(16L)).as("b"))
      .as[(Long, Long)].collect().toMap
    var cum = 0L
    val want = rows.sortBy { case (id, _) => (bucketMap(id), id) }.map {
      case (id, t) =>
        val s = cum / 1500L
        cum += t
        id -> s
    }.toMap
    assert(got == want)
  }

  test("every doc assigned once; shards contiguous; balance bound holds") {
    val rows = fixture(5000, 11)
    val maxDoc = rows.map(_._2).max
    val budget = 2000L
    val plan = Packing.shardPlan(rows.toDF("id", "toks"), "id", col("toks"),
        budgetTokens = budget, orderBuckets = 32)
      .as[(Long, Long, Long)].collect()
    assert(plan.length == rows.length)
    assert(plan.map(_._1).toSet == rows.map(_._1).toSet)
    val byShard = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val shards = byShard.keys.toSeq.sorted
    assert(shards == (0L to shards.max).toSeq, s"non-contiguous: $shards")
    val last = shards.max
    byShard.filter(_._1 != last).foreach { case (s, tot) =>
      assert(tot >= budget - maxDoc + 1 && tot <= budget + maxDoc - 1,
        s"shard $s total $tot outside [${budget - maxDoc + 1}, ${budget + maxDoc - 1}]")
    }
  }

  test("plan is invariant to input partitioning") {
    val rows = fixture(2000, 3)
    val df1 = rows.toDF("id", "toks")
    val df2 = rows.toDF("id", "toks").repartition(17)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      Packing.shardPlan(df, "id", col("toks"), budgetTokens = 1000L)
        .orderBy(col("id")).as[(Long, Long, Long)].collect().toSeq
    assert(planOf(df1) == planOf(df2))
  }

  test("writeShards lays out one file per shard and loses no rows") {
    val rows = fixture(1500, 9)
    val df = rows.toDF("id", "toks").withColumn("payload", col("id") * 2)
    val plan = Packing.shardPlan(df, "id", col("toks"), budgetTokens = 1200L)
    val path = tmpDir("shard-layout")
    Packing.writeShards(df, plan, "id", path)
    val back = spark.read.parquet(path)
    assert(back.count() == rows.length)
    assert(back.select(col("id")).as[Long].collect().toSet == rows.map(_._1).toSet)
    // one data file per shard directory
    import scala.jdk.CollectionConverters._
    val byDir = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      .iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .toSeq.groupBy(_.getParent.getFileName.toString)
    assert(byDir.nonEmpty && byDir.values.forall(_.size == 1),
      s"expected 1 file per shard dir: ${byDir.view.mapValues(_.size).toMap}")
    // the written shard totals match the plan's
    val wrote = back.groupBy(col("shard")).agg(sum(col("toks")).as("t"))
      .as[(Long, Long)].collect().toMap
    val planned = plan.groupBy(col("shard")).agg(sum(col("n_tokens")).as("t"))
      .as[(Long, Long)].collect().toMap
    assert(wrote == planned)
  }

  test("custom md5 bucket column is honored (cross-engine replay form)") {
    val rows = fixture(800, 5)
    val md5Bucket =
      conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long") % 8L
    val plan = Packing.shardPlan(rows.toDF("id", "toks"), "id", col("toks"),
        budgetTokens = 900L, orderBuckets = 8, bucketOf = Some(md5Bucket))
      .as[(Long, Long, Long)].collect()
    assert(plan.length == rows.length)
    // reference walk in (md5 bucket, id) order
    val bm = rows.toDF("id", "toks").select(col("id"), md5Bucket.as("b"))
      .as[(Long, Long)].collect().toMap
    var cum = 0L
    val want = rows.sortBy { case (id, _) => (bm(id), id) }.map { case (id, t) =>
      val s = cum / 900L; cum += t; id -> s
    }.toMap
    assert(plan.map(r => r._1 -> r._3).toMap == want)
  }
}
