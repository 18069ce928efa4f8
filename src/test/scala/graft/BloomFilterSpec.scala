package graft

import graft.functions.BloomFilter
import graft.operators.Decontamination

import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {

  import spark.implicits._

  private val Bits = 4096
  private val K = 5

  test("zero false negatives: every inserted value probes true") {
    val values = spark.range(2000).select(concat(lit("m"), col("id")).as("v"))
    val bloom = values.agg(BloomFilter.sketch(col("v"), Bits * 4, K).as("b"))
    val misses = values.crossJoin(broadcast(bloom))
      .filter(!BloomFilter.contains(col("b"), col("v"), Bits * 4, K))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate is bounded at the designed load") {
    // 300 members in 4096 bits (~13.7 bits/elem, k=5): theoretical fp
    // ~ 0.008; assert a loose 5% on 10k non-members
    val members = spark.range(300).select(concat(lit("in"), col("id")).as("v"))
    val bloom = members.agg(BloomFilter.sketch(col("v"), Bits, K).as("b"))
    val fp = spark.range(10000).select(concat(lit("out"), col("id")).as("v"))
      .crossJoin(broadcast(bloom))
      .filter(BloomFilter.contains(col("b"), col("v"), Bits, K))
      .count()
    assert(fp < 500L, s"fp=$fp")
    assert(fp > 0L || true) // fp may legitimately be zero at this load
  }

  test("words are partition/order-invariant and OR-merge across groups") {
    val df = spark.range(3000).select(
      (col("id") % 5).as("g"), concat(lit("w"), col("id")).as("v"))
    val whole = df.agg(BloomFilter.sketch(col("v"), Bits, K)).collect().head.getSeq[Long](0)
    val repart = df.repartition(11).agg(BloomFilter.sketch(col("v"), Bits, K))
      .collect().head.getSeq[Long](0)
    assert(whole == repart)
    val grouped = df.groupBy(col("g")).agg(BloomFilter.sketch(col("v"), Bits, K).as("b"))
      .agg(aggregate(
        collect_list(col("b")),
        array_repeat(lit(0L), Bits / 64),
        (acc, b) => zip_with(acc, b, (x, y) => x.bitwiseOR(y))).as("u"))
      .collect().head.getSeq[Long](0)
    assert(whole == grouped)
  }

  test("flagContaminatedBloom: exact columns match flagContaminated, no false negatives") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta other words here"),
      (4L, "totally clean document nothing shared at all")
    ).toDF("doc_id", "text")
    val eval = Seq(Tuple1("alpha beta gamma delta")).toDF("text")
    val exact = Decontamination.flagContaminated(docs, eval, "doc_id", "text", n = 4)
      .select("id", "n_grams", "eval_hits", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val bloom = Decontamination.flagContaminatedBloom(docs, eval, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(bloom.map(r => (r._1, r._2, r._3, r._5)) == exact)
    // no false negatives: bloom_hits >= eval_hits, flag implied
    bloom.foreach { r =>
      assert(r._4 >= r._3)
      if (r._5) assert(r._6)
    }
    assert(bloom.count(_._5) == 2) // docs 1 and 3 share the eval 4-gram
  }

  test("probe stays inside whole-stage codegen") {
    val bloomWords = (1 to Bits / 64).map(_.toLong)
    val scan = spark.range(64).select(
      BloomFilter.contains(
        array(bloomWords.map(w => lit(w) + col("id") * 0): _*),
        concat(lit("p"), col("id")), Bits, K).as("hit"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"bloom probe not whole-stage-codegen'd:\n$plan")
  }
}
