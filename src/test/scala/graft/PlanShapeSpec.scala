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

  test("marginMineFromCandidates never broadcasts or nested-loops the candidates") {
    val cand = (for { s <- 1L to 20L; t <- 100L to 119L }
      yield (s, t, (s * 31 + t * 17) % 1000000L)).toDF("src_id", "tgt_id", "sim")
    val plan = graft.operators.BitextMine
      .marginMineFromCandidates(cand, k = 4, minMarginMicro = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
  }

  test("marginMineAnn joins candidates on list id — corpus never broadcast or nested-looped") {
    val index = graft.operators.IvfAnn.build(vecs, "vec_id", "embedding", nlist = 4, iters = 1)
    try {
      val src = vecs.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val plan = graft.operators.BitextMine.marginMineAnn(
        src, "qid", "qv", index, k = 3, minMarginMicro = 0L, nprobe = 2,
        simFn = (a, b) => floor(graft.functions.VectorFunctions.cosine(a, b) * lit(1e6)).cast("long"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
    } finally index.assigned.unpersist()
  }

  test("triangle wedges join on node keys — never a cartesian product") {
    val edges = (for { a <- 1L to 20L; b <- 1L to 20L if a < b && (a + b) % 3 != 0 }
      yield (a, b)).toDF("a", "b")
    val plan = graft.operators.Graphs.nodeTriangles(edges, "a", "b")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
  }

  test("zorder withZ broadcasts only the one-row bounds; bit sum stays in codegen") {
    // a parquet source, not a local relation — local relations skip
    // codegen wrapping and would make the span assertion vacuous
    val src = tmpDir("zorder-plan")
    (0L until 500L).map(i => (i, i * 7 % 311)).toDF("a", "b")
      .write.mode("overwrite").parquet(src)
    val z = graft.operators.ZOrder.withZ(spark.read.parquet(src), Seq("a", "b"), bits = 8)
    // execute THIS queryExecution (count() would plan a different one)
    // so AQE finalizes and codegen spans appear in the plan string
    z.queryExecution.toRdd.count()
    val plan = z.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"bounds not broadcast:\n$plan")
    // the 32-term interleave is plain arithmetic — it must live inside
    // a whole-stage-codegen span (the `*(n)` operator prefix), not
    // fall back to interpreted eval
    assert(plan.contains("*("), s"no codegen span:\n$plan")
  }

  test("suffix-array doubling joins on (doc, pos) keys — never a cartesian product") {
    val docs = (1L to 10L).map(i => (i, s"alpha beta gamma delta tail$i end$i"))
      .toDF("doc_id", "text")
    val ix = graft.operators.SuffixArray.build(docs, "doc_id", "text")
    val plan = graft.operators.SuffixArray.adjacentLcp(ix)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
    ix.unpersist()
  }

  test("groupScatter aggregates before anything label-pairwise (one scan)") {
    val qe = SimilaritySearch.groupScatter(vecs, "label", "embedding")
      .queryExecution
    val scans = qe.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"corpus scanned more than once:\n${qe.optimizedPlan}")
  }

  test("quantile sketch is one partial-aggregable pass; top-k pools stay TakeOrdered") {
    val Q = graft.operators.QuantileSketch
    val rows = (1L to 500L).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    // build = a counted group-by: partial (map-side) + final HashAggregate,
    // ONE exchange — the shape that lets 100 TB combine before shuffling
    val skPlan = Q.build(rows, Seq("k"), col("v"), 7)
      .queryExecution.executedPlan.toString
    assert(skPlan.contains("HashAggregate") || skPlan.contains("SortAggregate"),
      s"no aggregate:\n$skPlan")
    assert("Exchange".r.findAllIn(skPlan).size <= 1,
      s"more than one exchange in a single group-by:\n$skPlan")
    // the two-stage retrieval's candidate pool must be a bounded
    // TakeOrderedAndProject (map-side partial top-k), never a global sort
    val pool = rows.select(col("v").as("vec_id"))
      .orderBy(col("vec_id").desc).limit(64)
      .queryExecution.executedPlan.toString
    assert(pool.contains("TakeOrderedAndProject"),
      s"orderBy+limit did not plan as TakeOrdered:\n$pool")
  }

  test("q41's year filter is a PUSHED date range, not a function over the column") {
    // year(col) === 1996 pushes below the joins but cannot prune
    // parquet row groups; the explicit range reaches the scan's
    // PushedFilters, where min/max stats skip whole row groups — at
    // 100x that is reading one year instead of every row group
    val plan = SparkEntry.queries("q41_region_revenue")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // o_orderdate is timestamp_ntz in the testdata, so the date
    // literals push down as timestamps; the FileScan summary truncates
    // long filter lists, so assert the lower bound in PushedFilters
    // and the upper bound in the (untruncated) Filter node
    assert(plan.contains("GreaterThanOrEqual(o_orderdate,1996-01-01T00:00"),
      s"expected the o_orderdate lower bound in PushedFilters:\n$plan")
    assert(plan.contains("< 1997-01-01 00:00:00"),
      s"expected the o_orderdate upper bound filter:\n$plan")
    assert(!plan.contains("year("),
      s"year(col) must not appear as a filter:\n$plan")
  }
}
