package graft

import graft.operators.Sampling

import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 1000).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "id")

  test("samplePerGroup: exactly k per group, deterministic across runs") {
    val s1 = Sampling.samplePerGroup(df, Seq("g"), Seq("id"), k = 5)
    val s2 = Sampling.samplePerGroup(df, Seq("g"), Seq("id"), k = 5)
    val counts = s1.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 5) && counts.size == 4)
    assert(s1.collect().map(_.toSeq).toSet == s2.collect().map(_.toSeq).toSet)
  }

  test("hashRate: rate is close to num/denom and stable") {
    val kept = Sampling.hashRate(df, Seq("id"), num = 1, denom = 4)
    val n = kept.count()
    assert(n > 150 && n < 350, s"expected ~250 of 1000, got $n")
    assert(kept.count() == n) // deterministic
  }

  test("mixtureSample: per-group rates, deterministic, default for unlisted") {
    val kept = Sampling.mixtureSample(
      df, "g", Seq("id"),
      rates = Map("g0" -> ((1, 1)), "g1" -> ((1, 4)), "g2" -> ((0, 1))),
      default = (1, 2))
    val counts = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts("g0") == 250L, "rate 1/1 keeps the whole group")
    assert(!counts.contains("g2"), "rate 0 drops the group entirely")
    val g1 = counts("g1")
    assert(g1 > 30 && g1 < 95, s"~1/4 of 250 expected, got $g1")
    val g3 = counts("g3")
    assert(g3 > 85 && g3 < 165, s"default 1/2 of 250 expected, got $g3")
    assert(kept.count() == counts.values.sum) // deterministic
  }

  test("mixtureSampleMd5: threshold digits give monotone rates") {
    val kept = Sampling.mixtureSampleMd5(
      df, "g", col("id"),
      rateSixteenths = Map("g0" -> 16, "g1" -> 4, "g2" -> 0),
      defaultSixteenths = 8)
    val counts = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts("g0") == 250L)
    assert(!counts.contains("g2"))
    assert(counts("g1") < counts("g3"), "4/16 must keep fewer than 8/16")
  }

  test("packChunks: offsets are contiguous per shard and packs respect the budget") {
    val docs = (1 to 200).map(i => (i.toLong, 10L + i % 7)).toDF("doc_id", "toks")
    val packed = graft.operators.Packing
      .packChunks(docs, "doc_id", col("toks"), budgetTokens = 100L, shards = 3)
    val rows = packed.select("shard", "pack_id", "pack_offset", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    // per shard: offsets start at 0 and are the running sum of tokens
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4, "offsets must be gapless")
        case _ =>
      }
      // pack id is the offset's budget bucket
      sorted.foreach(r => assert(r._2 == r._3 / 100L))
    }
    // determinism
    val again = graft.operators.Packing
      .packChunks(docs, "doc_id", col("toks"), budgetTokens = 100L, shards = 3)
      .select("shard", "pack_id", "pack_offset", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.toSet == again.toSet)
  }

  test("mixturePlan: weights normalize, targets respect the budget, upsampled small source") {
    // big source: 8 docs x 10 tokens; small source: 2 docs x 10 tokens
    val docs = ((1 to 8).map(i => ("big", s"${"w " * 9}w"))
      ++ (1 to 2).map(i => ("small", s"${"w " * 9}w")))
      .toDF("source", "text")
    val plan = Sampling.mixturePlan(docs, "source", "text", budgetTokens = 100L)
      .as[(String, Long, Long, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, nBig, tBig, shareBig, wBig, targetBig, epochsBig) = plan("big")
    val (_, nSmall, tSmall, shareSmall, wSmall, targetSmall, epochsSmall) = plan("small")
    assert(nBig == 8L && tBig == 80L && nSmall == 2L && tSmall == 20L)
    assert(shareBig == 0.8 && shareSmall == 0.2)
    // sqrt temper: 80/20 natural -> sqrt(80):sqrt(20) = 2:1
    assert(math.abs(wBig - 2.0 / 3) < 1e-4 && math.abs(wSmall - 1.0 / 3) < 1e-4)
    assert(targetBig + targetSmall <= 100L)
    // tempering upsamples the small source relative to the big one
    assert(epochsSmall > epochsBig)
    assert(math.abs(epochsSmall - targetSmall.toDouble / tSmall) < 1e-4)
  }

  test("upsampleSixteenths: floor copies for all, md5 fraction gets one extra, zero drops") {
    val docs = (1 to 200).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "id")
    val out = Sampling.upsampleSixteenths(
      docs, "g", "id", Map("g0" -> 36, "g1" -> 0), defaultSixteenths = 16)
      .select(col("g"), col("id"), col("copy_idx"))
      .as[(String, Long, Int)].collect()
    assert(out.forall(_._1 == "g0"), "g1 (0 sixteenths) must vanish")
    val copies = out.groupBy(_._2).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // 36/16 = 2 guaranteed copies; fraction 4/16 adds a third for ~1/4 of ids
    assert(copies.values.forall(c => c == Seq(0, 1) || c == Seq(0, 1, 2)),
      "copy_idx must be gapless from 0")
    val extra = copies.values.count(_.size == 3)
    assert(extra > 10 && extra < 40, s"~25 of 100 expected an extra copy, got $extra")
    // default: exactly one copy per row for an unlisted group
    val deflt = Sampling.upsampleSixteenths(
      docs.filter(col("g") === "g1"), "g", "id", Map.empty)
    assert(deflt.count() == 100 &&
      deflt.select(max(col("copy_idx"))).head().getInt(0) == 0)
    // determinism
    val again = Sampling.upsampleSixteenths(
      docs, "g", "id", Map("g0" -> 36, "g1" -> 0), defaultSixteenths = 16)
      .select(col("g"), col("id"), col("copy_idx"))
      .as[(String, Long, Int)].collect()
    assert(out.toSet == again.toSet)
  }

  test("weightedSample: deterministic, weight-monotone inclusion, exact keys") {
    import org.apache.spark.sql.functions._
    val df = spark.range(200).select(
      col("id").as("doc_id"), (col("id") % 10 + 1).cast("long").as("w"))
    val a = graft.operators.Sampling.weightedSample(df, "doc_id", col("w"), 30)
      .select("doc_id").as[Long].collect().toSeq
    val b = graft.operators.Sampling.weightedSample(df.repartition(7), "doc_id", col("w"), 30)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b) // partition-invariant AND deterministic
    // heavier weights should be overrepresented: mean weight of the
    // sample must exceed the population mean (5.5)
    val meanW = graft.operators.Sampling.weightedSample(df, "doc_id", col("w"), 30)
      .agg(avg(col("w"))).collect().head.getDouble(0)
    assert(meanW > 5.5, s"meanW=$meanW")
    // key formula replays the closed form for one row
    val row = graft.operators.Sampling.weightedSample(
      df.filter(col("doc_id") === 7), "doc_id", col("w"), 1)
      .select(col("__wkey")).collect().head.getLong(0)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("7".getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
    val u = (java.lang.Long.parseLong(hex, 16) % 1000000L + 1L).toDouble / 1000000.0
    assert(row == math.floor(StrictMath.log(u) / 8.0 * 1e6).toLong)
  }

  test("epochShuffleKey: deterministic per epoch, different across epochs") {
    val df = (1L to 50L).toDF("id")
    val k1a = Sampling.epochShuffleKey(df, "id", epoch = 1)
      .orderBy(col("__ek")).select("id").as[Long].collect().toSeq
    val k1b = Sampling.epochShuffleKey(df, "id", epoch = 1)
      .orderBy(col("__ek")).select("id").as[Long].collect().toSeq
    val k2 = Sampling.epochShuffleKey(df, "id", epoch = 2)
      .orderBy(col("__ek")).select("id").as[Long].collect().toSeq
    assert(k1a == k1b)                 // reproducible
    assert(k1a != k2)                  // epochs permute differently
    assert(k1a.sorted == (1L to 50L))  // a permutation, nothing lost
    assert(k1a != (1L to 50L).toSeq)   // and actually shuffled
  }

  test("epochShuffleKey is a stateless projection (stream-legal)") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val keyed = Sampling.epochShuffleKey(stream.toDF().toDF("id"), "id", epoch = 3)
    assert(keyed.isStreaming)
  }

  test("clusterAwareSplit: dup clusters co-split, singletons match plain hashSplit") {
    import org.apache.spark.sql.Column
    val docs = (1L to 200L).toDF("id")
    // clusters {10,110,120} (chained) and {20,130}
    val pairs = Seq((10L, 110L), (110L, 120L), (20L, 130L)).toDF("a", "b")
    val bucketOf: Column => Column = r => pmod(xxhash64(r), lit(100L))
    val got = Sampling
      .clusterAwareSplit(docs, "id", pairs, "a", "b",
        Seq(("train", 90), ("val", 5), ("test", 5)), bucketOf)
      .as[(Long, String)].collect().toMap
    // every cluster member shares the representative's split
    assert(Set(got(10L), got(110L), got(120L)).size == 1)
    assert(got(20L) == got(130L))
    // singletons are assigned exactly as the plain id-hashed split
    val plain = Sampling
      .hashSplitBy(docs, pmod(xxhash64(col("id")), lit(100L)),
        Seq(("train", 90), ("val", 5), ("test", 5)))
      .as[(Long, String)].collect().toMap
    val clustered = Set(10L, 110L, 120L, 20L, 130L)
    docs.as[Long].collect().filterNot(clustered).foreach { id =>
      assert(got(id) == plain(id), s"singleton $id moved splits")
    }
    // and the clusters' shared split is the REPRESENTATIVE's plain split
    assert(got(10L) == plain(10L) && got(20L) == plain(20L))
  }
}
