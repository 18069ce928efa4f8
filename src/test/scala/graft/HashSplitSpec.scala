package graft

import graft.operators.Sampling

import org.apache.spark.sql.functions._

class HashSplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 1000L).toDF("id")

  test("every row gets a split and proportions track the weights") {
    val counts = Sampling.hashSplit(docs, Seq("id"), Seq(("train", 8), ("val", 1), ("test", 1)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000L)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 700L && counts("train") < 900L, s"train skewed: $counts")
    assert(counts("val") > 50L && counts("val") < 150L)
    assert(counts("test") > 50L && counts("test") < 150L)
  }

  test("assignment is append-stable: new rows never move existing rows") {
    val splits = Seq(("train", 3), ("test", 1))
    val before = Sampling.hashSplit(docs, Seq("id"), splits)
      .as[(Long, String)].collect().toMap
    val appended = (0L until 2000L).toDF("id")
    val after = Sampling.hashSplit(appended, Seq("id"), splits)
      .as[(Long, String)].collect().toMap
    for ((id, split) <- before) assert(after(id) == split, s"row $id moved")
  }

  test("split boundaries follow cumulative weight ranges exactly") {
    val out = Sampling
      .hashSplitBy(docs, pmod(col("id"), lit(10L)), Seq(("a", 5), ("b", 3), ("c", 2)))
      .as[(Long, String)].collect()
    for ((id, split) <- out) {
      val expected = if (id % 10 < 5) "a" else if (id % 10 < 8) "b" else "c"
      assert(split == expected, s"id $id -> $split, wanted $expected")
    }
  }

  test("splitting is a shuffle-free projection") {
    val plan = Sampling.hashSplit(docs, Seq("id"), Seq(("train", 9), ("test", 1)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
