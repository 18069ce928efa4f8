package graft

import graft.operators.SimilaritySearch
import graft.functions.VectorFunctions

import org.apache.spark.sql.functions._

class KnnMmrSpec extends SparkSpec {
  import spark.implicits._

  test("mutual kNN kills one-directional hub edges") {
    // k=1: a<->b are each other's nn; c's nn is b, but b's nn is a,
    // so (b, c) is one-directional and must not survive
    val nodes = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.95f, 0.312f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "vec")
    val edges = SimilaritySearch.mutualKnnGraph(nodes, "id", "vec", k = 1)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSeq
    assert(edges == Seq((1L, 2L)), s"got $edges")
  }

  test("knnFromCandidates bounds per-source degree and breaks ties by dst") {
    val cand = Seq(
      (1L, 2L, 10L), (1L, 3L, 10L), (1L, 4L, 5L),
      (2L, 1L, 9L)).toDF("src", "dst", "sim")
    val got = SimilaritySearch.knnFromCandidates(cand, k = 2)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // src 1 keeps the two sim-10 edges (dst tie-break), drops sim-5
    assert(got == Seq((1L, 2L, 10L), (1L, 3L, 10L), (2L, 1L, 9L)), s"got $got")
  }

  test("MMR second pick trades relevance for diversity") {
    // all three are relevant; a and c sit on the same side of the
    // query, b on the other. Pure top-2 relevance would take (c, a)
    // (a wins the 0.95-tie by id); MMR takes the diverse b instead.
    val corpus = Seq(
      (1L, Seq(0.95f, 0.312f)),
      (2L, Seq(0.95f, -0.312f)),
      (3L, Seq(0.99f, 0.141f))).toDF("vec_id", "embedding")
    val got = SimilaritySearch
      .mmrSelect(corpus, "vec_id", "embedding", Seq(1.0f, 0.0f), k = 2)
      .select(col("rank"), col("id"))
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, 3L), (2, 2L)), s"got $got")
  }

  test("knnClassify: majority vote with deterministic tie policy, self excluded") {
    // query 9 at (1,0): nearest are the three label-1 vectors, then
    // two label-2; k=5 -> 3 votes label 1
    val corpus = Seq(
      (1L, Seq(1.0f, 0.1f), 1L), (2L, Seq(1.0f, -0.1f), 1L),
      (3L, Seq(0.9f, 0.0f), 1L),
      (4L, Seq(0.5f, 0.8f), 2L), (5L, Seq(0.5f, -0.8f), 2L),
      (6L, Seq(-1.0f, 0.0f), 3L),
      (9L, Seq(1.0f, 0.0f), 9L)).toDF("vec_id", "embedding", "label")
    val got = SimilaritySearch
      .knnClassify(corpus, corpus.filter(col("vec_id") === 9L),
        "vec_id", "embedding", "label", k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((9L, 1L, 3L)), s"got $got")
  }

  test("knnClassify prefilter: positional and margin forms match the unfiltered run") {
    // 40 corpus vectors in a fan around the x axis, 4 labels; margin
    // keeps near-ties past the pool cut, positional keeps the pool
    val corpus = (0 until 40).map { i =>
      val a = i * 0.02
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat), (i % 4).toLong)
    }.toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id") < 3L)
    def run(pool: Int, margin: Double) = SimilaritySearch
      .knnClassify(corpus, queries, "vec_id", "embedding", "label", k = 5,
        simFn = (a, b) =>
          floor(graft.functions.VectorFunctions.cosineDecimal(a, b) * lit(1e6)).cast("long"),
        prefilterPool = pool, prefilterMargin = margin)
      .orderBy(col("query_id"))
      .as[(Long, Long, Long)].collect().toSeq
    val truth = run(0, 0.0)
    assert(run(16, 0.0) == truth, "positional prefilter changed the gated top-k")
    assert(run(16, 1e-5) == truth, "margin prefilter changed the gated top-k")
    // a query with fewer than k candidates keeps everything (kth null)
    val tiny = corpus.filter(col("vec_id") < 3L)
    val small = SimilaritySearch
      .knnClassify(tiny, tiny.filter(col("vec_id") === 0L),
        "vec_id", "embedding", "label", k = 5,
        prefilterPool = 8, prefilterMargin = 1e-5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(small.size == 1 && small.head._1 == 0L)
  }

  test("knnClassifyAnn with every list probed equals the brute-force classifier") {
    val corpus = (0 until 60).map { i =>
      val a = i * 0.1
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat, (i % 7).toFloat / 7f),
        (i % 4).toLong)
    }.toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id") % 9 === 0)
      .select(col("vec_id"), col("embedding"))
    val index = graft.operators.IvfAnn.build(corpus, "vec_id", "embedding", nlist = 4)
    // nprobe = nlist: every list probed -> candidates = all pairs ->
    // identical ranking, vote, and tie policy as the brute force
    val ann = SimilaritySearch
      .knnClassifyAnn(index, queries, "vec_id", "embedding",
        corpus.select(col("vec_id"), col("label")), "vec_id", "label",
        k = 5, nprobe = 4)
      .orderBy(col("query_id")).as[(Long, Long, Long)].collect().toSeq
    val brute = SimilaritySearch
      .knnClassify(corpus, queries, "vec_id", "embedding", "label", k = 5)
      .orderBy(col("query_id")).as[(Long, Long, Long)].collect().toSeq
    assert(ann == brute, s"ann=$ann\nbrute=$brute")
    assert(ann.nonEmpty)
  }

  test("labelOutliers flags the far member, not the tight cluster") {
    // n must exceed factor + 1: a lone outlier among n members tops
    // out at ratio n - 1 as it recedes (it drags the centroid and the
    // mean with it) — the same masking arithmetic as the z-score spec
    val tight = (1L to 12L).map(i => (i, Seq(1.0f + 0.01f * i, 0.0f), 0L))
    val df = (tight :+ ((13L, Seq(10.0f, 10.0f), 0L)))
      .toDF("vec_id", "embedding", "label")
    val got = SimilaritySearch
      .labelOutliers(df, "vec_id", "embedding", "label", factor = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(13L), s"got $got")
  }

  test("knnClassify vote ties break on STRING labels' natural order") {
    // query equidistant from one "b"-labeled and one "a"-labeled
    // vector: 1 vote each, the ascending-label tie rule must pick "a"
    // (the numeric-cast regression turned string labels into nulls)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.1f), "b"), (2L, Seq(1.0f, -0.1f), "a"),
      (9L, Seq(1.0f, 0.0f), "q")).toDF("vec_id", "embedding", "label")
    val got = SimilaritySearch
      .knnClassify(corpus, corpus.filter(col("vec_id") === 9L),
        "vec_id", "embedding", "label", k = 2)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((9L, "a", 1L)), s"got $got")
  }

  test("mutualKnnGraphAnn with every list probed equals the brute-force graph") {
    // three well-separated clusters of 6; nlist=3 so lists ~= clusters
    val nodes = (0 until 18).map { i =>
      val c = i % 3
      val base = Seq(Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f),
        Seq(0.0f, 0.0f, 1.0f))(c)
      (i.toLong, base.zipWithIndex.map { case (x, d) =>
        x + 0.01f * ((i / 3) + 1) * (d + 1) })
    }.toDF("id", "vec")
    val simFn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column =
      (a, b) => floor(VectorFunctions.cosineDecimal(a, b) * lit(1e6)).cast("long")
    val exact = SimilaritySearch
      .mutualKnnGraph(nodes, "id", "vec", k = 3, simFn = simFn)
      .as[(Long, Long, Long)].collect().toSet
    val index = operators.IvfAnn.build(nodes, "id", "vec", nlist = 3, iters = 2)
    val full = SimilaritySearch.mutualKnnGraphAnn(index, k = 3, nprobe = 3,
        simFn = simFn)
      .as[(Long, Long, Long)].collect().toSet
    assert(full == exact, s"full-probe ANN graph diverged: ${full.diff(exact)} / ${exact.diff(full)}")
    // single-probe: candidates only within each node's own list — the
    // within-cluster edges (clusters align with lists) must survive
    val one = SimilaritySearch.mutualKnnGraphAnn(index, k = 3, nprobe = 1,
        simFn = simFn)
      .as[(Long, Long, Long)].collect().toSet
    assert(one.subsetOf(exact), "nprobe=1 graph must be a subset of the exact graph")
    assert(one.size >= exact.size / 2, s"nprobe=1 recall collapsed: ${one.size}/${exact.size}")
    index.assigned.unpersist()
  }

  test("mutualKnnGraph's broadcast guard trips past the node cap") {
    val nodes = (1L to 10L).map(i => (i, Seq(i.toFloat, 1.0f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.mutualKnnGraph(nodes, "id", "vec", k = 2,
        maxBroadcastNodes = 5)
    }
    assert(e.getMessage.contains("mutualKnnGraphAnn"))
  }

  test("mutualKnnGraph with knownNodeCount runs no guard job") {
    // a node frame that throws if ANY job executes: with the count
    // supplied the call must stay fully lazy; without it the guard's
    // CollectLimit job runs and trips the poison
    val poisoned = spark.range(5).as[Long]
      .map { i =>
        if (i >= 0) throw new RuntimeException("guard job executed")
        (i, Seq(1.0f, 0.0f))
      }.toDF("id", "vec")
    val g = SimilaritySearch.mutualKnnGraph(poisoned, "id", "vec", k = 2,
      knownNodeCount = Some(5L))
    assert(g.columns.toSeq == Seq("id_a", "id_b", "sim")) // plan built, nothing ran
    val e = intercept[org.apache.spark.SparkException] {
      SimilaritySearch.mutualKnnGraph(poisoned, "id", "vec", k = 2)
    }
    assert(e.getMessage.contains("guard job executed") ||
      Option(e.getCause).exists(_.getMessage.contains("guard job executed")))
    // and the supplied count still enforces the broadcast cap
    val trip = intercept[IllegalArgumentException] {
      SimilaritySearch.mutualKnnGraph(poisoned, "id", "vec", k = 2,
        maxBroadcastNodes = 3, knownNodeCount = Some(5L))
    }
    assert(trip.getMessage.contains("mutualKnnGraphAnn"))
  }

  test("MMR of an all-duplicates corpus scores later picks rel - 1e6") {
    val corpus = (1L to 3L).map(i => (i, Seq(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val rows = SimilaritySearch
      .mmrSelect(corpus, "vec_id", "embedding", Seq(0.6f, 0.8f), k = 2)
      .orderBy(col("rank")).collect()
    val rel = rows(0).getLong(2)
    assert(rows(0).getLong(3) == rel)            // first pick: pure relevance
    assert(rows(1).getLong(3) <= rel - 999999L)  // dup penalty ~ full similarity
    assert(rows(1).getLong(1) == 2L)             // ties by id after the first
  }
}
