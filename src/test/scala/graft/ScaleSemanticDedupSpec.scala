package graft

import graft.operators.{KMeansTrain, SemanticDedup}

import org.apache.spark.sql.functions._

/** Semantic dedup at the sf1-rehearsal embedding scale (20k hash
  * vectors from [[ScaleFixture]] + 1% planted near-duplicates), run
  * at the REALISTIC k — [[SemanticDedup.sizedK]], the ~300
  * vectors/cluster knee the sf1 bench measured — rather than the
  * oracle-tractable k=8 the gated query fixes. Gates that the sizing
  * rule (a) stays under the oversize guard, and (b) still catches the
  * planted duplicates, i.e. the scale-safe parameterization is also
  * the correct one.
  */
class ScaleSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("sizedK clamps and targets ~300 vectors per cluster") {
    assert(SemanticDedup.sizedK(0) == 8)
    assert(SemanticDedup.sizedK(2000) == 8)       // floor
    assert(SemanticDedup.sizedK(20000) == 66)     // 20000/300
    assert(SemanticDedup.sizedK(3000000) == 10000)
    assert(SemanticDedup.sizedK(100000000000L) == 65536) // ceiling
    assert(SemanticDedup.sizedK(20000, targetMeanClusterSize = 1000) == 20)
  }

  test("sf1-scale fixture dedups at sizedK without tripping the oversize guard") {
    val dir = tmpDir("scale-semdedup")
    ScaleFixture.write(spark, dir, nDocs = 10, nVecs = 20000)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val perturbed = emb
      .filter(col("vec_id") % 100 === 0)
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.0005f)).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(perturbed)

    val n = 20200L
    val k = SemanticDedup.sizedK(n)
    assert(k == 67)
    val cents = KMeansTrain.train(corpus, "vec_id", "embedding", k = k, iters = 2)
    assert(cents.size == k)

    // capture the guard channel: a correctly-sized k must not warn
    val captured = new java.io.ByteArrayOutputStream()
    val removals = Console.withErr(captured) {
      SemanticDedup.removalList(
        corpus, "vec_id", "embedding", cents, minCosine = 0.98)
    }.persist()
    assert(!captured.toString.contains("undersized"),
      s"oversize guard fired at sizedK: ${captured.toString}")

    // every planted near-dup that lands in its original's cluster must
    // be flagged with the original as its survivor; SemDeDup's own
    // cluster-boundary caveat means a few stragglers are legitimate
    val flagged = removals.filter(col("id") >= 1000000L)
      .select(col("id"), col("dup_of")).as[(Long, Long)].collect().toMap
    val planted = (0L until 20000L by 100L).map(_ + 1000000L)
    val caught = planted.count(p => flagged.get(p).contains(p - 1000000L))
    assert(caught >= (planted.size * 9) / 10,
      s"only $caught/${planted.size} planted near-dups caught at k=$k")
    removals.unpersist()
  }

  test("an undersized k trips the oversize warning") {
    val emb = (0L until 600L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 100).toFloat / 100f).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = KMeansTrain.train(emb, "vec_id", "embedding", k = 8, iters = 1)
    val captured = new java.io.ByteArrayOutputStream()
    Console.withErr(captured) {
      // maxClusterSize=100 -> guard threshold 50 < 600/8 = 75 mean
      SemanticDedup.nearDupPairs(
        emb, "vec_id", "embedding", cents, minCosine = 0.999, maxClusterSize = 100)
    }
    assert(captured.toString.contains("undersized"),
      s"expected the oversize warning, got: '${captured.toString}'")
  }
}
