package graft

import graft.operators.Dsir

import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target-flavored vocabulary vs raw-web-flavored vocabulary; doc 0
  // and the target rows share a dialect, docs 2/3 are off-target
  private lazy val corpus = Seq(
    (0L, "curated encyclopedia article about science history", false),
    (1L, "curated encyclopedia article about art history", true),
    (2L, "buy cheap pills now click here buy now", false),
    (3L, "lottery winner click claim prize now", false),
    (4L, "encyclopedia of natural science curated", true))
    .toDF("id", "text", "is_target")

  private lazy val ratios =
    Dsir.bucketLogRatios(corpus, "text", col("is_target"), buckets = 64)

  test("bucket table is dense and bounded") {
    assert(ratios.length == 64)
  }

  test("target-like documents outscore off-target documents") {
    val w = Dsir.scored(corpus, "id", "text", ratios)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(0L) > w(2L), "target-dialect doc must beat spam doc")
    assert(w(0L) > w(3L))
    assert(w(1L) > w(2L))
  }

  test("weights are layout-independent (exact integer sums)") {
    val a = Dsir.scored(corpus, "id", "text", ratios)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Dsir.scored(corpus.repartition(7), "id", "text", ratios)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("gram features: unigrams plus bigrams, no fallback duplicate for 1-token docs") {
    val g = Seq((1L, "one two three"), (2L, "solo"))
      .toDF("id", "text")
      .select(col("id"), Dsir.grams(split(col("text"), " ")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(1L) == Seq("one", "two", "three", "one two", "two three"))
    assert(g(2L) == Seq("solo"), "a single-token doc contributes its unigram once")
  }

  test("select returns top-n by weight with ascending-id ties") {
    val top = Dsir.select(corpus, "id", "text", ratios, n = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top.size == 2)
    val all = Dsir.scored(corpus, "id", "text", ratios)
      .orderBy(col("weight_q").desc, col("id")).collect().map(_.getLong(0)).toSeq
    assert(top == all.take(2))
  }
}
