package graft

import graft.operators.Decontamination

import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"), // contains the planted eval 4-gram
    (2L, "alpha beta gamma delta unrelated tail words here"), // same leading 4-gram
    (3L, "completely different content about catalyst optimizer internals"),
    (4L, "short doc"), // shorter than n: single whole-doc gram
    (5L, "beta gamma delta epsilon shifted by one position")) // overlapping 4-gram
    .toDF("doc_id", "text")

  private lazy val evalSet = Seq(
    "alpha beta gamma delta epsilon", // leaks grams into docs 1, 2, 5
    "totally disjoint benchmark question text")
    .toDF("text")

  test("flags exactly the docs sharing an n-gram with the eval set") {
    val out = Decontamination
      .flagContaminated(corpus, evalSet, "doc_id", "text", n = 4)
      .orderBy("id").collect()
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.length == 5)
    assert(byId(1L).getAs[Boolean]("contaminated"))
    assert(byId(2L).getAs[Boolean]("contaminated"))
    assert(!byId(3L).getAs[Boolean]("contaminated"))
    assert(!byId(4L).getAs[Boolean]("contaminated"))
    assert(byId(5L).getAs[Boolean]("contaminated"))
    // doc 1 has 3 distinct 4-grams, 2 of them in the eval set
    assert(byId(1L).getAs[Long]("n_grams") == 3L)
    assert(byId(1L).getAs[Long]("eval_hits") == 2L)
  }

  test("doc shorter than n matches only a whole-doc eval gram") {
    val leakyEval = Seq("short doc").toDF("text")
    val out = Decontamination
      .flagContaminated(corpus, leakyEval, "doc_id", "text", n = 4)
      .filter(col("id") === 4L).collect()
    assert(out.head.getAs[Boolean]("contaminated"))
    assert(out.head.getAs[Long]("eval_hits") == 1L)
  }

  test("SQL surface: array_hit_count registered and identical to the expression path") {
    GraftFunctions.registerAll(spark)
    Seq((1L, Seq("a b", "c d", "e f"))).toDF("id", "gs").createOrReplaceTempView("ahc_in")
    val sql = spark.sql("SELECT array_hit_count(gs, array('c d', 'x y')) AS h FROM ahc_in")
      .as[Long].head()
    assert(sql == 1L)
    // non-constant needle arrays are rejected at analysis, not silently slow
    val err = intercept[Exception] {
      spark.sql("SELECT array_hit_count(gs, gs) FROM ahc_in").collect()
    }
    assert(err.getMessage.contains("constant array"))
    // a foldable NULL array gets the same analysis error, not an NPE
    val errNull = intercept[Exception] {
      spark.sql("SELECT array_hit_count(gs, CAST(NULL AS ARRAY<STRING>)) FROM ahc_in").collect()
    }
    assert(errNull.getMessage.contains("constant array"), s"got: ${errNull.getMessage}")
  }

  test("eval probe rides a broadcast join by default") {
    val plan = Decontamination
      .flagContaminated(corpus, evalSet, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe in:\n$plan")
  }

  test("sizedNumBits floors at the default, scales per gram, and caps loudly") {
    // a tiny eval set floors at DefaultNumBits
    assert(Decontamination.sizedNumBits(evalSet, "text", n = 4)
      == graft.functions.BloomFilter.DefaultNumBits)
    // past the floor the width is bitsPerGram x distinct gram count:
    // fill stays constant as the eval corpus grows, so the fp bound is
    // a sizing theorem at any SF instead of a coin toss
    val grams = evalSet
      .select(explode(array_distinct(
        graft.functions.TextFunctions.ngramsFromTokens(
          graft.functions.TextFunctions.tokens(col("text")), 4))).as("g"))
      .distinct().count()
    val bpg = (2L * graft.functions.BloomFilter.DefaultNumBits / grams).toInt + 1
    val wide = Decontamination.sizedNumBits(evalSet, "text", n = 4, bitsPerGram = bpg)
    assert(wide > graft.functions.BloomFilter.DefaultNumBits)
    assert(wide.toLong == grams * bpg)
    // an eval corpus past the broadcast envelope fails loudly
    intercept[IllegalArgumentException] {
      Decontamination.sizedNumBits(evalSet, "text", n = 4, bitsPerGram = Int.MaxValue)
    }
  }
}
