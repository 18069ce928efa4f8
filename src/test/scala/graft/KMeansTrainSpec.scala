package graft

import graft.operators.{KMeansTrain, TopicAssign}

import org.apache.spark.sql.functions._

class KMeansTrainSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated planted clusters; k-means from any seeds
  // should converge onto them within a few Lloyd iterations
  private lazy val planted = (0 until 30).map { i =>
    val label = i % 3
    val j = (i / 3).toFloat / 100f
    val (x, y) = label match {
      case 0 => (1f + j, j)
      case 1 => (j, 1f - j)
      case _ => (-1f - j, -1f + j)
    }
    (i.toLong, label, Seq(x, y))
  }.toDF("vec_id", "label", "embedding")

  test("seedCentroids: deterministic md5 order, k rows, cluster ids 0..k-1") {
    val s1 = KMeansTrain.seedCentroids(planted, "vec_id", "embedding", 3)
    val s2 = KMeansTrain.seedCentroids(
      planted.repartition(7), "vec_id", "embedding", 3)
    assert(s1 == s2, "seeds must not depend on physical layout")
    assert(s1.map(_._1) == Seq(0, 1, 2))
  }

  test("train converges to a Lloyd fixed point that beats the seed loss") {
    def loss(cents: Seq[(Int, Seq[Long])]): Long =
      KMeansTrain.assign(planted, "vec_id", "embedding", cents)
        .agg(sum("dist")).as[Long].head()
    val seeds = KMeansTrain.train(planted, "vec_id", "embedding", k = 3, iters = 0)
    val c5 = KMeansTrain.train(planted, "vec_id", "embedding", k = 3, iters = 5)
    val c6 = KMeansTrain.train(planted, "vec_id", "embedding", k = 3, iters = 6)
    assert(c5 == c6, "well-separated planted data must reach a fixed point by 5 iters")
    assert(loss(c5) < loss(seeds), "training must improve on the seed assignment")
  }

  test("lloydStep: empty clusters keep their previous centroid") {
    val quantized = planted
      .select(col("vec_id"), TopicAssign.quantize(col("embedding")).as("q"))
    // a faraway centroid captures nothing and must survive unchanged
    // (kept inside the documented grid bound: squared dists must fit a Long)
    val far = Seq(50000000L, 50000000L)
    val cents = Seq(0 -> Seq(0L, 0L), 1 -> far)
    val next = KMeansTrain.lloydStep(quantized, cents)
    assert(next.toMap.apply(1) == far)
    assert(next.toMap.apply(0) != Seq(0L, 0L), "live cluster must move")
  }

  test("iters=0 returns the seeds; training loss never increases per iteration") {
    val seeds = KMeansTrain.train(planted, "vec_id", "embedding", k = 3, iters = 0)
    assert(seeds == KMeansTrain.seedCentroids(planted, "vec_id", "embedding", 3)
      .sortBy(_._1))
    val loss = (0 to 3).map { it =>
      val c = KMeansTrain.train(planted, "vec_id", "embedding", k = 3, iters = it)
      KMeansTrain.assign(planted, "vec_id", "embedding", c)
        .agg(sum("dist")).as[Long].head()
    }
    assert(loss.sliding(2).forall(p => p(1) <= p.head),
      s"loss must be monotone non-increasing, got $loss")
  }

  test("assign: dist equals the exact integer distance to the assigned centroid") {
    val cents = KMeansTrain.train(planted, "vec_id", "embedding", k = 3, iters = 2)
    val byCl = cents.toMap
    val q = TopicAssign.quantize(col("embedding"))
    val recomputed = planted.select(
      col("vec_id").as("id"),
      KMeansTrain.assignedQ(q, cents).as("cluster"),
      col("embedding"))
    val rows = KMeansTrain.assign(planted, "vec_id", "embedding", cents)
      .join(recomputed.select(col("id"), col("cluster").as("cl2"), col("embedding")), "id")
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("cluster") == r.getAs[Int]("cl2"))
      val qv = r.getSeq[Float](r.fieldIndex("embedding"))
        .map(x => math.floor(x.toDouble * 1e6).toLong)
      val c = byCl(r.getAs[Int]("cluster"))
      val d = qv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(r.getAs[Long]("dist") == d)
    }
  }

  test("one iteration is corpus-shuffle-free on the assignment side") {
    val cents = KMeansTrain.seedCentroids(planted, "vec_id", "embedding", 3)
    // the per-row assignment projection must contain no Exchange
    val assigned = planted.select(
      KMeansTrain.assignedQ(TopicAssign.quantize(col("embedding")), cents).as("cl"))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }

  test("centroid save/load round trip is exact and assigns identically") {
    val cents = KMeansTrain.train(planted, "vec_id", "embedding", k = 3, iters = 3)
    val path = tmpDir("kmeans-cents") + "/centroids"
    KMeansTrain.saveCentroids(cents, spark, path)
    val loaded = KMeansTrain.loadCentroids(spark, path)
    assert(loaded == cents)
    val live = KMeansTrain.assign(planted, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val replayed = KMeansTrain.assign(planted, "vec_id", "embedding", loaded)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(live == replayed)
  }
}
