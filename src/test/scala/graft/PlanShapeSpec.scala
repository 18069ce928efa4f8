package graft

import graft.operators.{SimilaritySearch, TextDedup}

import org.apache.spark.sql.functions._

/** Plan-shape regression guards for the session's operators: the scale
  * arguments in SCALE.md claim specific physical shapes (broadcast
  * small sides, no cartesian products, bounded self-joins) — these
  * asserts keep a refactor from silently trading them away.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = (0L until 200L)
    .map(i => (i, Seq(i.toFloat, (i * 3 % 7).toFloat, 1.0f), i % 4))
    .toDF("vec_id", "embedding", "label")

  test("knnClassify broadcasts the query side; no cartesian product") {
    val plan = SimilaritySearch
      .knnClassify(vecs, vecs.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", "label", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"query side not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("mutualKnnGraph broadcasts the node set; no cartesian product") {
    val plan = SimilaritySearch
      .mutualKnnGraph(vecs.limit(50), "vec_id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"node set not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("containmentPairs joins on gram keys — never a cartesian product") {
    val docs = (1L to 30L).map(i => (i, s"alpha beta gamma token$i tail$i end$i"))
      .toDF("id", "text")
    val plan = TextDedup
      .containmentPairs(docs, "id", "text", shingleSize = 3, maxDf = 10,
        minContainMicro = 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("mutualKnnGraphAnn never broadcasts the corpus and has no cartesian product") {
    val index = graft.operators.IvfAnn.build(vecs, "vec_id", "embedding", nlist = 4, iters = 1)
    try {
      val plan = SimilaritySearch.mutualKnnGraphAnn(index, k = 3, nprobe = 2)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
      // the candidate join must be keyed (list id), not nested-loop
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
    } finally index.assigned.unpersist()
  }

  test("image-hash banded pairs join on band keys — never a cartesian product") {
    val hashes = (1L to 40L).map(i => (i, Seq(i * 7 % 97, i * 13 % 89)))
      .toDF("media_id", "hash")
    val plan = graft.multimodal.ImageDedup
      .nearDupPairs(hashes, "media_id", "hash", maxHamming = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
  }

  test("groupScatter aggregates before anything label-pairwise (one scan)") {
    val qe = SimilaritySearch.groupScatter(vecs, "label", "embedding")
      .queryExecution
    val scans = qe.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"corpus scanned more than once:\n${qe.optimizedPlan}")
  }
}
