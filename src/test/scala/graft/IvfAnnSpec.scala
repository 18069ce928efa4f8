package graft

import graft.functions.NearestCentroid
import graft.operators.{IvfAnn, SimilaritySearch}

import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions._

class IvfAnnSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated clusters in 4-d plus the cluster centers
    * themselves; deterministic perturbations keep members close to
    * their center and far from the others.
    */
  private lazy val vectors = {
    val centers = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 20
    } yield {
      val eps = 0.01f * (j % 5)
      val v = c.map(x => x + eps)
      (ci.toLong * 100 + j, v.toSeq, ci)
    }
    rows.toDF("vec_id", "embedding", "truth")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def nc(vec: org.apache.spark.sql.Column, cents: Seq[Seq[Double]]) =
    GraftColumnShim.column(NearestCentroid(GraftColumnShim.expression(vec), cents))

  test("NearestCentroid picks the highest-cosine centroid; ties break low") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 1.0))
    val out = Seq(
      (1L, Seq(0.9f, 0.1f)),   // -> centroid 0
      (2L, Seq(0.1f, 0.9f)),   // -> centroid 1
      (3L, Seq(0.5f, 0.5f)),   // -> centroid 2 (exact direction match)
      (4L, Seq(0.0f, 0.0f)))   // zero vector: all cosines equal -> 0
      .toDF("id", "v")
      .select(col("id"), nc(col("v"), cents).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("NearestCentroid: dimension mismatch and null element land in list 0") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val mismatched = Seq((1L, Seq(1.0f, 0.0f, 0.0f))).toDF("id", "v")
      .select(nc(col("v"), cents).as("c")).as[Int].head()
    assert(mismatched == 0)
    val withNull = Seq((1L, Seq(Some(0.0f), None))).toDF("id", "v")
      .select(nc(col("v"), cents).as("c")).as[Int].head()
    assert(withNull == 0)
  }

  test("build is deterministic and recovers the planted clusters") {
    val a = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3)
    val b = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq,
      "same corpus + params must train identical centroids")
    // every planted cluster maps to exactly one inverted list
    val purity = a.assigned
      .join(vectors.select(col("vec_id").as("__id"), col("truth")), "__id")
      .groupBy(col("truth")).agg(countDistinct(col("__list")).as("lists"))
      .as[(Int, Long)].collect().toMap
    assert(purity.values.forall(_ == 1L), s"clusters split across lists: $purity")
    a.assigned.unpersist(); b.assigned.unpersist()
  }

  test("full probe equals the exact brute-force top-k") {
    val index = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3)
    val query = vectors.filter(col("vec_id") === 0)
    val ivf = IvfAnn.topK(index, query, k = 10, nprobe = 3)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Double)].collect().toSeq
    val brute = SimilaritySearch
      .bruteForceTopK(vectors, query, "vec_id", "embedding", k = 10)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Double)].collect().toSeq
    assert(ivf == brute, "probing every list must degenerate to the exact scan")
    index.assigned.unpersist()
  }

  test("sampled Lloyd training (corpus above the floor) stays deterministic and exact-on-full-probe") {
    // force the hash-sampled training path: targetRows = max(16, 1*3)
    // = 16 < 60 vectors. The full-probe==brute-force invariant holds
    // for ANY coarse partition, so it proves the sampled index serves
    // exact results; determinism pins the xxhash64 rate filter.
    val a = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3,
      trainSampleFloor = 16, trainPerCentroid = 1)
    val b = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3,
      trainSampleFloor = 16, trainPerCentroid = 1)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq,
      "sampled training must be deterministic")
    val query = vectors.filter(col("vec_id") === 0)
    val ivf = IvfAnn.topK(a, query, k = 10, nprobe = 3)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Double)].collect().toSeq
    val brute = SimilaritySearch
      .bruteForceTopK(vectors, query, "vec_id", "embedding", k = 10)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Double)].collect().toSeq
    assert(ivf == brute, "full probe over a sampled-trained index must stay exact")
    a.assigned.unpersist(); b.assigned.unpersist()
  }

  test("corpora at or below the sampling floor train bit-identically to the unsampled contract") {
    // 60 vectors < the 32768 default floor: the default build and an
    // explicitly-unsampled build must produce the same centroids and
    // the same assignment
    val a = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3)
    val b = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3,
      trainSampleFloor = Long.MaxValue / 2, trainPerCentroid = 1)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    val la = a.assigned.orderBy(col("__id")).select(col("__id"), col("__list"))
      .as[(Long, Int)].collect().toSeq
    val lb = b.assigned.orderBy(col("__id")).select(col("__id"), col("__list"))
      .as[(Long, Int)].collect().toSeq
    assert(la == lb)
    a.assigned.unpersist(); b.assigned.unpersist()
  }

  test("partial probe returns only probed lists and keeps the query's own neighbors") {
    val index = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3)
    val query = vectors.filter(col("vec_id") === 0)
    val top = IvfAnn.topK(index, query, k = 10, nprobe = 1)
      .as[(Long, Double)].collect().toSeq
    assert(top.nonEmpty && top.size <= 10)
    // nprobe=1 scans exactly the query's own list: every returned id
    // shares the query's planted cluster (ids 0-99), led by the query
    // itself at cosine ~1
    assert(top.head._1 == 0L && top.head._2 > 0.999)
    assert(top.forall(_._1 < 100L), s"leaked a foreign cluster: $top")
    index.assigned.unpersist()
  }

  test("save/load round trip: identical results and a partition-pruned probe scan") {
    val index = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3)
    val path = tmpDir("ivf-index")
    IvfAnn.save(index, path)
    val loaded = IvfAnn.load(spark, path, "vec_id", "embedding")
    assert(loaded.centroids.length == index.centroids.length)
    for ((a, b) <- loaded.centroids.zip(index.centroids)) assert(a.toSeq == b.toSeq)

    val query = vectors.filter(col("vec_id") === 0)
    val fromMem = IvfAnn.topK(index, query, k = 10, nprobe = 1)
      .select(col("vec_id"), round(col("cos"), 6)).as[(Long, Double)].collect().toSeq
    val fromDisk = IvfAnn.topK(loaded, query, k = 10, nprobe = 1)
      .select(col("vec_id"), round(col("cos"), 6)).as[(Long, Double)].collect().toSeq
    assert(fromDisk == fromMem)

    // the probe must prune at the directory level, not post-filter
    val plan = IvfAnn.topK(loaded, query, k = 10, nprobe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__list"),
      s"expected __list partition pruning in:\n$plan")
    index.assigned.unpersist()
  }

  test("append: assign-only ingest is lossless and equals a rebuild's assignment") {
    val index = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3)
    // new batch: near-copies of cluster 1's center plus a fresh outlier
    val fresh = Seq(
      (900L, Seq(0.02f, 1.0f, 0.0f, 0.0f)),
      (901L, Seq(0.0f, 0.98f, 0.01f, 0.0f)),
      (902L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val appended = IvfAnn.append(index, fresh)
    // the input index stays intact and usable
    assert(index.assigned.count() == 60L)
    assert(appended.assigned.count() == 63L)
    // lossless: full probe over the appended index == exact scan over the union
    val union = vectors.select("vec_id", "embedding").unionByName(fresh)
    val query = vectors.filter(col("vec_id") === 100)
    val ivf = IvfAnn.topK(appended, query, k = 10, nprobe = 3)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Double)].collect().toSeq
    val brute = SimilaritySearch
      .bruteForceTopK(union, query, "vec_id", "embedding", k = 10)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      .as[(Long, Double)].collect().toSeq
    assert(ivf == brute)
    // assignment used the existing centroids: appended rows land in the
    // same lists a NearestCentroid projection against them computes
    val expected = fresh
      .select(col("vec_id"),
        nc(col("embedding"), index.centroids.map(_.toSeq).toSeq).as("l"))
      .as[(Long, Int)].collect().toMap
    val actual = appended.assigned.filter(col("__id") >= 900L)
      .select(col("__id"), col("__list")).as[(Long, Int)].collect().toMap
    assert(actual == expected)
    appended.assigned.unpersist()
    index.assigned.unpersist()
  }

  test("appendToSaved: dynamic-partition append keeps directory pruning") {
    val index = IvfAnn.build(vectors, "vec_id", "embedding", nlist = 3, iters = 3)
    val path = tmpDir("ivf-append")
    IvfAnn.save(index, path)
    val fresh = Seq((950L, Seq(0.01f, 1.0f, 0.01f, 0.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    IvfAnn.appendToSaved(spark, path, fresh, "vec_id", "embedding")
    val loaded = IvfAnn.load(spark, path, "vec_id", "embedding")
    assert(loaded.assigned.count() == 61L)
    // the new vector is findable through a pruned probe on its own list
    val query = fresh
    val top = IvfAnn.topK(loaded, query, k = 3, nprobe = 1)
      .as[(Long, Double)].collect().toSeq
    assert(top.head._1 == 950L && top.head._2 > 0.999)
    val plan = IvfAnn.topK(loaded, query, k = 3, nprobe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__list"))
    index.assigned.unpersist()
  }

  test("probeLists ranks centroids by cosine with low-index ties") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.7, 0.7))
    val probes = IvfAnn.probeLists(cents, Array(1.0, 0.05), nprobe = 2)
    assert(probes == Seq(0, 2))
    // zero query vector: all cosines 0 -> index order
    assert(IvfAnn.probeLists(cents, Array(0.0, 0.0), nprobe = 2) == Seq(0, 1))
  }
}
