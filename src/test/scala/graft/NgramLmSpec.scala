package graft

import graft.operators.NgramLm

import org.apache.spark.sql.functions.col

/** Bigram-LM perplexity scoring: closed-form probabilities on a tiny
  * corpus, graceful unknown handling, boilerplate-vs-noise separation,
  * and the save/load round trip.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("closed-form bigram probabilities on a two-doc corpus") {
    // corpus: "a b a b" and "a c" ->
    //   pairs: (a,b)x2, (b,a)x1, (a,c)x1; c(a)=3, c(b)=1; V=3
    val corpus = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLm.train(corpus, "doc_id", "text")
    assert(model.vocabSize == 3)
    val bi = model.bigrams.collect()
      .map(r => (r.getAs[String]("ctx"), r.getAs[String]("w")) -> r.getAs[Long]("c")).toMap
    assert(bi == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))

    // score "a b": P(b|a) = (2+1)/(3+3) = 0.5 -> avg_logp = ln(0.5)
    val scored = NgramLm.perplexity(Seq((10L, "a b")).toDF("doc_id", "text"),
      model, "doc_id", "text").collect().head
    val expected = math.floor(math.log(0.5) * NgramLm.LogProbScale) / NgramLm.LogProbScale
    assert(scored.getAs[Long]("n_bigrams") == 1L)
    assert(scored.getAs[Double]("avg_logp") ==
      BigDecimal(expected).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(scored.getAs[Double]("perplexity") ==
      BigDecimal(math.exp(-expected)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    model.unpersist()
  }

  test("unknown bigrams and contexts degrade smoothly; short docs score null") {
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val model = NgramLm.train(corpus, "doc_id", "text")
    val out = NgramLm.perplexity(Seq(
        (10L, "the quick brown fox"), // all known bigrams
        (11L, "zz yy xx ww"), // nothing known
        (12L, "tiny")) // no bigram at all
      .toDF("doc_id", "text"), model, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val known = out(10L).getAs[Double]("perplexity")
    val unknown = out(11L).getAs[Double]("perplexity")
    assert(known < unknown, s"known text not more predictable: $known vs $unknown")
    assert(out(12L).getAs[Long]("n_bigrams") == 0L && out(12L).isNullAt(2) && out(12L).isNullAt(3))
    model.unpersist()
  }

  test("boilerplate scores lower perplexity than noise against a real-ish model") {
    val boiler = "subscribe to our newsletter for all the latest updates"
    val corpus = (1L to 40L).map(i =>
      (i, s"$boiler and document number $i carries words about spark tables"))
      .toDF("doc_id", "text")
    val model = NgramLm.train(corpus, "doc_id", "text")
    val out = NgramLm.perplexity(Seq(
        (100L, boiler), // pure boilerplate: maximally predictable
        (101L, "entropy chaos random unrelated lexicon fragments everywhere"))
      .toDF("doc_id", "text"), model, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("perplexity")).toMap
    assert(out(100L) < out(101L) / 10,
      s"boilerplate not clearly separated: $out")
    model.unpersist()
  }

  test("save -> load round-trips scoring; loaded tables stay on disk") {
    val corpus = (1L to 30L).map(i => (i, s"stored doc $i with words $i and more"))
      .toDF("doc_id", "text")
    val probe = Seq((100L, "stored doc 7 with surprise tail")).toDF("doc_id", "text")
    val model = NgramLm.train(corpus, "doc_id", "text")
    val live = NgramLm.perplexity(probe, model, "doc_id", "text")
      .select("id", "n_bigrams", "avg_logp", "perplexity")
      .as[(Long, Long, Double, Double)].collect().toSeq
    val path = tmpDir("ngram-lm")
    NgramLm.save(model, path, prefixBuckets = 16)
    val loaded = NgramLm.load(spark, path)
    assert(loaded.vocabSize == model.vocabSize)
    val fromDisk = NgramLm.perplexity(probe, loaded, "doc_id", "text")
      .select("id", "n_bigrams", "avg_logp", "perplexity")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(fromDisk == live)
    model.unpersist()
  }
}
