package graft

import graft.operators.SemanticDedup

import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal-plane clusters: "east" ids 0-6 spread 15 degrees
  // apart in the (x,z) plane (adjacent cosine 0.966 — below the 0.98
  // near-dup bar), "north" ids 10-16 the same shape in the (y,w)
  // plane (cosine 0 to every east vector). id 7 is a planted 0.5
  // degree perturbation of id 3 — the single true near-dup pair.
  private def east(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, 0f, math.sin(r).toFloat, 0f)
  }
  private def north(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(0f, math.cos(r).toFloat, 0f, math.sin(r).toFloat)
  }
  private lazy val corpus =
    ((0 until 7).map(i => (i.toLong, east(i * 15.0))) :+ (7L -> east(45.5)))
      .++((10 until 17).map(i => (i.toLong, north((i - 10) * 15.0))))
      .toDF("id", "vec")

  // hand-picked mid-cluster centroids on the µ-grid (the operator
  // takes ANY centroid table — trained or curated; training is
  // KMeansTrainSpec's concern)
  private val cents = Seq(
    0 -> Seq(707106L, 0L, 707106L, 0L),
    1 -> Seq(0L, 707106L, 0L, 707106L))

  test("removalList flags the near-duplicate, keeps the lower id") {
    val removed = SemanticDedup
      .removalList(corpus, "id", "vec", cents, minCosine = 0.98)
      .collect()
    assert(removed.map(_.getLong(0)).toSeq == Seq(7L))
    val row = removed.head
    assert(row.getAs[Long]("dup_of") == 3L)
    assert(row.getAs[Long]("n_dups") == 1L)
    assert(row.getAs[Double]("cos_max") > 0.99)
  }

  test("pairs only form within a cluster (the SemDeDup recall caveat)") {
    // two near-identical vectors (cosine 0.999) placed on opposite
    // sides of the cluster bisector: different clusters, so SemDeDup
    // must NOT pair them — the method's documented blind spot
    val straddling = corpus.unionByName(Seq(
      8L -> Seq(0.72f, 0.69f, 0f, 0f),
      18L -> Seq(0.69f, 0.72f, 0f, 0f)).toDF("id", "vec"))
    val pairs = SemanticDedup
      .nearDupPairs(straddling, "id", "vec", cents, minCosine = 0.98)
    val ids = pairs.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains((8L, 18L)),
      "near-identical vectors in different clusters must stay unpaired")
    assert(ids.contains((3L, 7L)), "the in-cluster planted pair is still found")
    pairs.unpersist()
  }

  test("cluster-size guard drops oversized clusters entirely") {
    val none = SemanticDedup
      .removalList(corpus, "id", "vec", cents, minCosine = 0.98, maxClusterSize = 3)
      .collect()
    assert(none.isEmpty, "both clusters exceed 3 members -> no pairs at all")
  }

  test("broadcast decision is a BYTE budget, not a row count") {
    // the old 400k-ROW limit approved any narrow corpus; at production
    // embedding widths the same rows are gigabytes — the decision must
    // flip on rows x dim bytes (r17 review #5)
    val budget = 256L << 20
    assert(SemanticDedup.shouldBroadcastVectors(400000L, 64, budget),
      "the fixture-width corpus the row limit was calibrated on still broadcasts")
    assert(!SemanticDedup.shouldBroadcastVectors(400000L, 768, budget),
      "400k x 768-dim (~2.4 GB) must NOT broadcast despite passing the old row limit")
    assert(!SemanticDedup.shouldBroadcastVectors(20000L, 4096, budget),
      "a wide-vector corpus far below the old row limit engages the shuffle path")
    assert(!SemanticDedup.shouldBroadcastVectors(10L, -1, budget),
      "an unreadable dim (null vec probe) falls back to the safe shuffle plan")
    // and the shuffle path is result-identical to the broadcast path
    val viaShuffle = SemanticDedup
      .removalList(corpus, "id", "vec", cents, minCosine = 0.98,
        broadcastVectorBytes = 0L)
      .collect()
    assert(viaShuffle.map(_.getLong(0)).toSeq == Seq(7L),
      "forcing the shuffle join-back must not change results")
  }

  test("removal survivors: dropping the removal list keeps one per dup set") {
    val removeIds = SemanticDedup
      .removalList(corpus, "id", "vec", cents, minCosine = 0.98)
      .select("id")
    val kept = corpus.join(removeIds, Seq("id"), "left_anti")
    assert(kept.count() == 14)
    assert(kept.filter(col("id") === 3L).count() == 1, "the representative survives")
  }
}
