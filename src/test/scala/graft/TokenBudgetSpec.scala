package graft

import graft.operators.Sampling

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  // total order (score desc, id asc): 1(100) 2(200) 5(150) 3(300) 6(50) 4(400)
  // running:                           100    300    450    750    800   1200
  private lazy val docs = Seq(
    (1L, 0.9, 100L), (2L, 0.9, 200L), (3L, 0.8, 300L),
    (4L, 0.7, 400L), (5L, 0.9, 150L), (6L, 0.8, 50L))
    .toDF("id", "score", "toks")

  test("keeps the exact prefix of the (score desc, id) order") {
    val out = Sampling.tokenBudgetSelect(docs, "id", "score", "toks", budget = 800L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 100L, 2L -> 300L, 5L -> 450L, 3L -> 750L, 6L -> 800L))
  }

  test("budget below the first document keeps nothing") {
    assert(Sampling.tokenBudgetSelect(docs, "id", "score", "toks", budget = 99L).count() == 0L)
  }

  test("agrees with the naive single-window running sum") {
    val naive = docs
      .withColumn("cum_tokens",
        sum(col("toks")).over(
          Window.orderBy(col("score").desc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= 800L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    val scaled = Sampling.tokenBudgetSelect(docs, "id", "score", "toks", budget = 800L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(scaled == naive)
  }

  test("continuous scores are quantized: bounded prefix, naive-order agreement") {
    // unrounded scores (1/id) would otherwise make |distinct scores| =
    // n_docs and degenerate layer 1; the internal round(_, 2) caps it
    val continuous = spark.range(1, 201)
      .select(col("id"), (lit(1.0) / col("id").cast("double")).as("score"),
        lit(10L).as("toks"))
    val out = Sampling
      .tokenBudgetSelect(continuous, "id", "score", "toks", budget = 500L, scorePrecision = 2)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    val naive = continuous
      .withColumn("q", round(col("score"), 2) + 0.0)
      .withColumn("cum_tokens",
        sum(col("toks")).over(
          Window.orderBy(col("q").desc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= 500L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(out == naive)
    assert(out.size == 50)
  }

  test("per-document windows are partitioned; only the tiny score table is not") {
    val plan = Sampling.tokenBudgetSelect(docs, "id", "score", "toks", budget = 800L)
      .queryExecution.executedPlan.toString
    // the document-side window carries a partition spec...
    assert(plan.contains("partitionBy") || plan.contains("windowspecdefinition(score"),
      s"expected a score-partitioned window in:\n$plan")
    // ...and the score prefix rides a broadcast join back onto documents
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast prefix join in:\n$plan")
  }
}
