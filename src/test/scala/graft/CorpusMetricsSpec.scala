package graft

import graft.functions.HyperLogLog
import graft.operators.{Lexicon, Packing}

import org.apache.spark.sql.functions._

class CorpusMetricsSpec extends SparkSpec {

  import spark.implicits._

  test("diversityStats: hand-computed bigram counts and ratio") {
    val docs = Seq(
      ("en", "a b a b"),     // bigrams: "a b","b a","a b" -> 3 total, 2 distinct
      ("en", "a b"),         // "a b" -> 1 total, dup of above
      ("fr", "x")            // short doc: whole text as one gram
    ).toDF("lang", "text")
    val out = Lexicon.diversityStats(docs, "text", "lang", 2)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("en", 4L, 2L, 0.5), ("fr", 1L, 1L, 1.0)))
  }

  test("lengthBuckets: boundary assignment, clamping, exact waste ledger") {
    val df = Seq(16, 17, 32, 100, 5000).toDF("n")
    val out = Packing.lengthBuckets(df, col("n"), minBucket = 16, maxBucket = 128)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // 16 -> bucket 16 (boundary inclusive); 17,32 -> 32; 100 -> 128;
    // 5000 clamps to 128 and its tokens clamp to the bucket
    assert(out == Seq(
      (16L, 1L, 16L, 16L, 0.0),
      (32L, 2L, 49L, 64L, 0.2344),
      (128L, 2L, 228L, 256L, 0.1094)))
  }

  test("HLL intersection estimate tracks a constructed overlap") {
    val a = spark.range(3000).select(concat(lit("k"), col("id")).as("v"))
    val b = spark.range(2000, 6000).select(concat(lit("k"), col("id")).as("v"))
    val ska = a.agg(HyperLogLog.sketch(col("v")).as("sk"))
    val skb = b.agg(HyperLogLog.sketch(col("v")).as("sk"))
    val est = ska.crossJoin(skb.select(col("sk").as("sk2")))
      .select(HyperLogLog.intersectionEstimate(col("sk"), col("sk2")))
      .collect().head.getDouble(0)
    // true intersection: ids 2000..2999 -> 1000
    assert(math.abs(est / 1000.0 - 1.0) < 0.35, s"est=$est")
  }

  test("tokenEntropy: hand-computed micro-nat values") {
    val docs = Seq(
      (1L, "a a a a"),          // single token: entropy 0
      (2L, "a b"),              // uniform over 2: -2*floor(ln(0.5)*1e6)
      (3L, "a a b")             // k=2 n=3 and k=1 n=3
    ).toDF("doc_id", "text")
    val out = graft.operators.Lexicon.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 4L, 1L, 0L)))
    val ln05 = math.floor(StrictMath.log(0.5) * 1e6).toLong // -693148
    assert(out(1) == ((2L, 2L, 2L, -2L * ln05)))
    val e3 = -(2L * math.floor(StrictMath.log(2.0 / 3.0) * 1e6).toLong +
      1L * math.floor(StrictMath.log(1.0 / 3.0) * 1e6).toLong)
    assert(out(2) == ((3L, 3L, 2L, e3)))
  }
}
