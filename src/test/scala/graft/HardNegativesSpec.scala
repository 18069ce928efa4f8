package graft

import graft.operators.SimilaritySearch

import org.apache.spark.sql.functions._

class HardNegativesSpec extends SparkSpec {

  import spark.implicits._

  // label 0 along +x, label 1 rotated off-axis at varying angles
  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f), 0),
    (1L, Seq(0.9f, 0.1f), 0),
    (2L, Seq(0.8f, 0.6f), 1),  // cos vs +x = 0.8
    (3L, Seq(0.6f, 0.8f), 1),  // cos vs +x = 0.6
    (4L, Seq(0.0f, 1.0f), 1)   // cos vs +x = 0.0
  ).toDF("vec_id", "embedding", "label")

  test("same-label vectors and self are excluded; ranking by cosine desc") {
    val got = SimilaritySearch
      .hardNegatives(corpus, corpus.filter(col("vec_id") === 0), "vec_id", "embedding", "label", k = 2)
      .select("query_id", "rank", "neg_id")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // query 0 (label 0): negatives are 2, 3, 4; top-2 by cosine = 2 then 3
    assert(got == Seq((0L, 1, 2L), (0L, 2, 3L)))
  }

  test("each query ranks independently") {
    val got = SimilaritySearch
      .hardNegatives(corpus, corpus.filter(col("vec_id").isin(0L, 4L)), "vec_id", "embedding", "label", k = 1)
      .select("query_id", "neg_id")
      .as[(Long, Long)].collect().toMap
    assert(got(0L) == 2L) // nearest label-1 to +x
    assert(got(4L) == 1L) // nearest label-0 to +y is (0.9, 0.1)? no: cos((0,1),(0.9,.1))=.1/.905 vs (1,0)=0
    // (0.9,0.1): cos = 0.1/norm ~ 0.110; (1,0): cos = 0 -> 1 wins
  }

  test("group centroids: cosine of mean vectors via sum vectors") {
    // group 0 mean = (1, 0); group 1 mean = (0, 1) -> cos 0
    // group 2 mean = (1, 1)/norm vs group 0 -> cos = 1/sqrt(2)
    val df = Seq(
      (0, Seq(2.0f, 0.0f)), (0, Seq(0.0f, 0.0f)),
      (1, Seq(0.0f, 1.0f)),
      (2, Seq(1.0f, 1.0f))
    ).toDF("label", "embedding")
    val got = SimilaritySearch.groupCentroidSimilarity(df, "label", "embedding")
      .select(col("group_a"), col("group_b"), round(col("cos"), 6))
      .as[(Int, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0, 1, 0.0),
      (0, 2, BigDecimal(1.0 / math.sqrt(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (1, 2, BigDecimal(1.0 / math.sqrt(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("group scatter: zero for identical members, exact variance otherwise") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(1.0f, 2.0f)),      // identical -> 0
      (1, Seq(0.0f, 0.0f)), (1, Seq(2.0f, 0.0f))).toDF("label", "embedding")
    val got = SimilaritySearch.groupScatter(df, "label", "embedding")
      .orderBy(col("group"))
      .as[(Int, Long, Double)].collect().toSeq
    // label 1: dim0 values {0, 2}: mean 1, var 1; dim1 var 0 -> trace 1
    assert(got == Seq((0, 2L, 0.0), (1, 2L, 1.0)), s"got $got")
  }

  test("group centroids: one corpus scan, no per-pair rescan") {
    val df = (0 until 100).map(i => (i % 5, Seq(i.toFloat, (i * 2).toFloat)))
      .toDF("label", "embedding")
    val sim = SimilaritySearch.groupCentroidSimilarity(df, "label", "embedding")
    assert(sim.count() == 10L) // C(5,2)
    // centroid-table self-join only: the big input appears once in the plan
    val scans = sim.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size <= 2, s"expected the corpus scanned once per side at most")
  }

  test("k bounds the per-query output; queries broadcast in the plan") {
    val hn = SimilaritySearch
      .hardNegatives(corpus, corpus.limit(1), "vec_id", "embedding", "label", k = 10)
    assert(hn.count() == 3L) // only 3 cross-label candidates exist
    val plan = hn.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast of the query side:\n$plan")
  }
}
