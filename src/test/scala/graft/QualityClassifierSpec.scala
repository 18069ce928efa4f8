package graft

import graft.operators.QualityClassifier
import graft.operators.QualityClassifier.{M, PortableMd5Scheme, XxHash64Scheme}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha alpha alpha alpha"), // repeated token: sum = 4 * one weight
    (3L, "x"),
    (4L, "mixed Case  Whitespace   run"))
    .toDF("doc_id", "text")

  private def rows(scheme: QualityClassifier.HashScheme): Map[Long, Row] =
    QualityClassifier.score(docs, "doc_id", "text", scheme)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

  test("score contract holds under both hash schemes") {
    for (scheme <- Seq(XxHash64Scheme, PortableMd5Scheme)) {
      val byId = rows(scheme)
      assert(byId.size == 4)
      // token counts: lower/trim/whitespace-split semantics
      assert(byId(1L).getAs[Long]("n_tokens") == 4L)
      assert(byId(4L).getAs[Long]("n_tokens") == 4L)
      // repeated token: feat_sum is exactly 4x the single-token weight,
      // and every per-token weight is in [0, M)
      val sum = byId(2L).getAs[Long]("feat_sum")
      assert(sum % 4L == 0L)
      assert(sum >= 0L && sum < 4L * M)
      // keep gate agrees with the exact integer definition
      for ((_, r) <- byId) {
        val s = r.getAs[Long]("feat_sum")
        val n = r.getAs[Long]("n_tokens")
        assert(r.getAs[Boolean]("keep") == (2 * s > n * M))
        // score is the mean weight, in [-1, 1)
        val score = r.getAs[Double]("score")
        assert(score >= -1.0 && score < 1.0)
      }
    }
  }

  test("schemes disagree on hashes but agree on the contract") {
    val a = rows(XxHash64Scheme)
    val b = rows(PortableMd5Scheme)
    // same ids, same token counts; feature sums generally differ
    assert(a.keySet == b.keySet)
    for (id <- a.keySet)
      assert(a(id).getAs[Long]("n_tokens") == b(id).getAs[Long]("n_tokens"))
  }

  test("native HashedLinearScore is bit-identical to the HOF form") {
    import graft.functions.TextFunctions
    val toks = TextFunctions.tokens(col("text"))
    val wide = docs.unionAll(Seq((5L, ""), (6L, "   ")).toDF("doc_id", "text"))
    val both = wide.select(
      col("doc_id"),
      org.apache.spark.sql.GraftColumnShim.column(
        graft.functions.HashedLinearScore(
          org.apache.spark.sql.GraftColumnShim.expression(toks),
          QualityClassifier.NumBuckets, QualityClassifier.A,
          QualityClassifier.C, QualityClassifier.M)).as("native"),
      QualityClassifier.featSumHof(toks, XxHash64Scheme).as("hof"))
      .collect()
    assert(both.nonEmpty)
    for (r <- both)
      assert(r.getAs[Long]("native") == r.getAs[Long]("hof"), s"mismatch at $r")
  }

  test("SQL surface: hashed_linear_score registered and identical to the Column path") {
    GraftFunctions.registerAll(spark)
    docs.createOrReplaceTempView("qc_in")
    val sql = spark.sql(
      """SELECT doc_id, hashed_linear_score(split(lower(trim(text)), '\\s+')) AS fs
        |FROM qc_in""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val col = rows(XxHash64Scheme).map { case (id, r) => id -> r.getAs[Long]("feat_sum") }
    assert(sql == col)
  }

  test("scoring is a single shuffle-free projection") {
    val plan = QualityClassifier.score(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("null text is deterministically rejected, not a null gate") {
    val withNull = Seq((1L, Some("alpha beta")), (2L, None))
      .toDF("doc_id", "text")
    for (scheme <- Seq(XxHash64Scheme, PortableMd5Scheme)) {
      val byId = QualityClassifier.score(withNull, "doc_id", "text", scheme)
        .collect().map(r => r.getAs[Long]("id") -> r).toMap
      assert(byId(2L).getAs[Long]("n_tokens") == 0L)
      assert(byId(2L).getAs[Long]("feat_sum") == 0L)
      assert(!byId(2L).isNullAt(4) && !byId(2L).getAs[Boolean]("keep"))
    }
    // filter(keep) and filter(!keep) partition ALL rows between them
    val scored = QualityClassifier.score(withNull, "doc_id", "text")
    val kept = scored.filter(col("keep")).count()
    val rejected = scored.filter(!col("keep")).count()
    assert(kept + rejected == 2L)
  }

  test("scoreWithWeights: all-ones table sums to the token count under both schemes") {
    val ones = Seq.fill(QualityClassifier.NumBuckets)(1.0)
    for (scheme <- Seq(XxHash64Scheme, PortableMd5Scheme)) {
      val rows = QualityClassifier.scoreWithWeights(docs, "doc_id", "text", ones, scheme)
        .collect()
      for (r <- rows)
        assert(r.getAs[Double]("w_sum") == r.getAs[Long]("n_tokens").toDouble,
          s"scheme $scheme: $r")
    }
  }

  test("scoreWithWeights serves a handcrafted trained table") {
    // place +1.0 at "good"'s bucket and -1.0 at "bad"'s, zero elsewhere
    // (buckets computed with the same pmod(xxhash64) the serving path uses)
    val buckets = Seq("good", "bad").toDF("t")
      .select(col("t"), pmod(xxhash64(col("t")), lit(QualityClassifier.NumBuckets.toLong)).as("b"))
      .as[(String, Long)].collect().toMap
    assert(buckets("good") != buckets("bad"), "test tokens collided; pick others")
    val weights = Array.fill(QualityClassifier.NumBuckets)(0.0)
    weights(buckets("good").toInt) = 1.0
    weights(buckets("bad").toInt) = -1.0
    val docs = Seq(
      (1L, Some("good good filler")), // w_sum 2.0 -> keep
      (2L, Some("bad filler")), // w_sum -1.0 -> reject
      (3L, Some("filler only text")), // w_sum 0.0 -> reject (gate is > 0)
      (4L, None)) // null contract
      .toDF("doc_id", "text")
    val byId = QualityClassifier
      .scoreWithWeights(docs, "doc_id", "text", weights.toSeq)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[Double]("w_sum") == 2.0 && byId(1L).getAs[Boolean]("keep"))
    assert(byId(1L).getAs[Double]("score") == 0.6667) // 2.0 / 3 tokens
    assert(byId(2L).getAs[Double]("w_sum") == -1.0 && !byId(2L).getAs[Boolean]("keep"))
    assert(byId(3L).getAs[Double]("w_sum") == 0.0 && !byId(3L).getAs[Boolean]("keep"))
    assert(byId(4L).getAs[Long]("n_tokens") == 0L && !byId(4L).getAs[Boolean]("keep"))
    // serving stays a shuffle-free projection (whole-stage codegen of
    // HashedWeightScore is asserted in ExpressionCodegenSpec, where the
    // input cannot constant-fold away)
    val plan = QualityClassifier.scoreWithWeights(docs, "doc_id", "text", weights.toSeq)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("train: distributed logistic GD reaches separation, served through the real path") {
    // two disjoint class vocabularies mixed with shared filler, so the
    // boundary is learnable but not trivial (filler weights must stay
    // near zero under balanced classes)
    val goodVocab = Seq("coherent", "prose", "citation", "paragraph", "analysis")
    val badVocab = Seq("zzspam", "clickzz", "buyzz", "winzz", "freezz")
    val filler = Seq("the", "and", "of")
    val labeled = (0 until 40).map { i =>
      val vocab = if (i % 2 == 0) goodVocab else badVocab
      val words = (0 until 12).map(j => vocab((i + j) % vocab.size)) ++ filler
      (i.toLong, words.mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "label")

    val w = QualityClassifier.train(labeled, "text", "label", epochs = 40, learningRate = 4.0)
    assert(w.length == QualityClassifier.NumBuckets)

    // the trained table served through scoreWithWeights (the actual
    // serving path, native expression included) classifies every doc:
    // the train-time decision boundary IS the serving keep gate
    val served = QualityClassifier.scoreWithWeights(labeled, "doc_id", "text", w.toSeq)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    (0 until 40).foreach { i =>
      assert(served(i.toLong) == (i % 2 == 0), s"doc $i misclassified after training")
    }
    // docs with no tokens neither train nor crash
    val degenerate = Seq((1L, "", true), (2L, "zzspam zzspam", false))
      .toDF("doc_id", "text", "label")
    val w2 = QualityClassifier.train(degenerate, "text", "label", epochs = 2)
    assert(w2.length == QualityClassifier.NumBuckets)
  }
}
