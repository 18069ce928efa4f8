package graft

import graft.operators.{KMeansTrain, ProductQuantizer => PQ, TopicAssign}

import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim vectors around four planted corners so 2-subspace codebooks
  // separate them cleanly
  private lazy val planted = (0 until 40).map { i =>
    val g = i % 4
    val j = (i / 4).toFloat / 100f
    val base = g match {
      case 0 => Seq(1f, 1f, 1f, 1f)
      case 1 => Seq(1f, 1f, -1f, -1f)
      case 2 => Seq(-1f, -1f, 1f, 1f)
      case _ => Seq(-1f, -1f, -1f, -1f)
    }
    (i.toLong, g, base.map(_ + j))
  }.toDF("vec_id", "grp", "embedding")

  test("training is deterministic and independent of physical layout") {
    val a = PQ.train(planted, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    val b = PQ.train(planted.repartition(7), "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    assert(a == b)
  }

  test("m=1 PQ training IS KMeansTrain: identical centroids from identical seeds") {
    val cb = PQ.train(planted, "vec_id", "embedding", m = 1, ksub = 4, iters = 3)
    val km = KMeansTrain.train(planted, "vec_id", "embedding", k = 4, iters = 3)
    assert(cb.books.head == km.map(_._2),
      s"single-subspace PQ must reduce to plain k-means:\n${cb.books.head}\nvs\n${km.map(_._2)}")
  }

  test("encode: codes in range, same-group vectors share codes, groups differ") {
    // ksub=2 matches the two natural values per subspace (+1/-1), so
    // each planted corner must collapse to exactly one code pair
    val cb = PQ.train(planted, "vec_id", "embedding", m = 2, ksub = 2, iters = 3)
    val enc = PQ.encode(planted, "vec_id", "embedding", cb)
      .join(planted.select(col("vec_id"), col("grp")), "vec_id")
      .select(col("grp"), col("codes"))
      .as[(Int, Seq[Int])].collect()
    assert(enc.forall(_._2.forall(c => c >= 0 && c < 2)))
    val byGrp = enc.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    // each planted corner collapses to one code pair...
    assert(byGrp.values.forall(_.size == 1), s"groups must be code-pure: $byGrp")
    // ...and the four corners use four distinct pairs
    assert(byGrp.values.flatten.toSet.size == 4)
  }

  test("encode and ADC scoring are shuffle-free stateless projections") {
    val cb = PQ.train(planted, "vec_id", "embedding", m = 2, ksub = 4, iters = 1)
    val enc = PQ.encode(planted, "vec_id", "embedding", cb)
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
    val qQ = Seq(1f, 1f, 1f, 1f).map(x => math.floor(x.toDouble * 1e6).toLong)
    val scored = enc.select(col("vec_id")) // top-k plan below
    val plan = PQ.adcTopK(enc, "vec_id", PQ.distTable(qQ, cb), cb, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"ADC top-k must be TakeOrderedAndProject, not a global sort:\n$plan")
  }

  test("ADC distance with the row's own vector as query equals reconDist") {
    val cb = PQ.train(planted, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    val rows = planted.select(col("vec_id"), col("embedding"),
      PQ.reconDist(col("embedding"), cb).as("recon"))
      .as[(Long, Seq[Float], Long)].collect()
    val enc = PQ.encode(planted, "vec_id", "embedding", cb)
    rows.take(5).foreach { case (id, vec, recon) =>
      val qQ = vec.map(x => math.floor(x.toDouble * 1e6).toLong)
      val adc = PQ.adcTopK(enc.filter(col("vec_id") === id), "vec_id",
        PQ.distTable(qQ, cb), cb, 1)
        .select(col("adc_dist")).as[Long].head()
      assert(adc == recon, s"vec $id: adc $adc != recon $recon")
    }
  }

  test("distTable: hand-computed m=2, dsub=1, ksub=2 example") {
    val cb = PQ.Codebooks(m = 2, dsub = 1,
      books = Seq(Seq(Seq(0L), Seq(10L)), Seq(Seq(5L), Seq(-5L))))
    // query (3, 4): sub0 dists -> (9, 49); sub1 -> (1, 81)
    assert(PQ.distTable(Seq(3L, 4L), cb) == Seq(9L, 49L, 1L, 81L))
  }

  test("ADC top-k retrieves the query's planted corner first") {
    val cb = PQ.train(planted, "vec_id", "embedding", m = 2, ksub = 4, iters = 3)
    val enc = PQ.encode(planted, "vec_id", "embedding", cb)
    val qQ = Seq(-1f, -1f, 1f, 1f).map(x => math.floor(x.toDouble * 1e6).toLong)
    val top = PQ.adcTopK(enc, "vec_id", PQ.distTable(qQ, cb), cb, 10)
      .join(planted.select(col("vec_id"), col("grp")), "vec_id")
      .select(col("grp")).as[Int].collect()
    assert(top.forall(_ == 2), s"all top-10 must be corner 2, got ${top.toSeq}")
  }

  test("codebook save/load round trip is exact and encodes identically") {
    val cb = PQ.train(planted, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    val path = tmpDir("pq-books")
    PQ.save(cb, spark, path)
    val loaded = PQ.load(spark, path)
    assert(loaded == cb, "books, m and dsub must survive the round trip")
    val live = PQ.encode(planted, "vec_id", "embedding", cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    val replayed = PQ.encode(planted, "vec_id", "embedding", loaded)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    assert(live == replayed)
  }
}
