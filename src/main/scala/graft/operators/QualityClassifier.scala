package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Hashed-bag-of-words linear quality scorer — the fastText-shaped
  * classifier every large corpus pipeline runs ("does this doc look
  * like reference text?"): tokens are feature-hashed into a fixed
  * weight table, the doc's score is the mean token weight, and the
  * keep gate is score > 0.
  *
  * There is no model file in this container, so the DEFAULT weight
  * table is a deterministic function of the bucket index (an LCG step)
  * — the plumbing (hash → bucket → weight → mean → gate) is the real
  * artifact. [[scoreWithWeights]] is the serving path for a trained
  * model: it takes the weight array itself and evaluates it through the
  * native [[graft.functions.HashedWeightScore]] expression (the table
  * rides in the task closure — broadcast-array shape, one array read
  * per token).
  *
  * Numeric contract: tokens are scored in INTEGER space (the raw LCG
  * value, exact under any summation order) and converted to a float
  * weight only once per document, so the score is bit-stable across
  * engines and partitionings — same trick as the decimal-sum oracles.
  * Per row it is one codegen'd projection: no shuffle, no UDF, no
  * state; at 100 TB this is a pure map over the corpus scan.
  */
object QualityClassifier {

  /** Feature-hash buckets. */
  val NumBuckets = 4096
  /** LCG constants (glibc): v = (bucket * A + C) mod M, weight = v/H - 1. */
  val A = 1103515245L
  val C = 12345L
  val M = 1000003L
  /** Half of M, so weights span [-1, 1). */
  val H = 500001.5

  /** Pluggable token-hash family, mirroring [[TextDedup.MinhashScheme]]:
    * xxhash64 is the production path; the portable scheme uses a 60-bit
    * md5 prefix (`('0x' || substr(md5(t),1,15))::BIGINT` in DuckDB) so
    * the whole score is replayable in SQL — that is how
    * `text_quality_classifier` is oracle-gated.
    */
  sealed trait HashScheme { def bucket(token: Column): Column }
  case object XxHash64Scheme extends HashScheme {
    def bucket(token: Column): Column = pmod(xxhash64(token), lit(NumBuckets.toLong))
  }
  case object PortableMd5Scheme extends HashScheme {
    def bucket(token: Column): Column =
      conv(substring(md5(token), 1, 15), 16, 10).cast("long") % NumBuckets
  }

  /** Integer weight of one bucket (float weight = v/H - 1). */
  private def rawWeight(bucket: Column): Column = (bucket * A + C) % M

  /** HOF formulation of the feature sum — the bit-identical
    * differential oracle for the native
    * [[graft.functions.HashedLinearScore]] expression
    * (QualityClassifierSpec), and the execution form of the portable
    * scheme.
    */
  private[graft] def featSumHof(toks: Column, scheme: HashScheme): Column =
    aggregate(
      transform(toks, t => rawWeight(scheme.bucket(t))),
      lit(0L),
      (acc, v) => acc + v)

  /** Per-document score + keep gate.
    *
    * Null contract: a NULL text scores exactly like an empty document —
    * `n_tokens = 0`, `feat_sum = 0`, `score` null (a mean over zero
    * tokens has no value; ANSI division would otherwise throw),
    * `keep = false` (deterministically rejected, never a null gate that
    * both `filter(keep)` and `filter(!keep)` would drop).
    *
    * @return (id, n_tokens, feat_sum, score, keep): token count, exact
    *         integer feature sum, mean weight in [-1, 1) rounded to 4
    *         decimals, and the keep flag (mean weight > 0, decided by
    *         the exact integer comparison `2*feat_sum > n*M`)
    */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      scheme: HashScheme = XxHash64Scheme): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // production scheme resolves to the native HashedLinearScore
    // expression (primitive per-token loop); the portable scheme keeps
    // the HOF form it exists to replay in SQL
    val featSum = scheme match {
      case XxHash64Scheme =>
        org.apache.spark.sql.GraftColumnShim.column(
          graft.functions.HashedLinearScore(
            org.apache.spark.sql.GraftColumnShim.expression(toks), NumBuckets, A, C, M))
      case _ => featSumHof(toks, scheme)
    }
    df.select(
        col(idCol).as("id"),
        // null text folds to the empty-document case (see null contract)
        coalesce(size(toks).cast("long"), lit(0L)).as("n_tokens"),
        coalesce(featSum, lit(0L)).as("feat_sum"))
      .select(
        col("id"),
        col("n_tokens"),
        col("feat_sum"),
        // `+ 0.0` normalizes IEEE signed zero (-0.0 + 0.0 = +0.0) so the
        // score is safe to group/order by downstream (tokenBudgetSelect)
        when(col("n_tokens") > 0L,
          round(col("feat_sum").cast("double") / (col("n_tokens").cast("double") * lit(H)) - 1.0, 4)
            + 0.0).as("score"),
        (col("feat_sum") * 2L > col("n_tokens") * M).as("keep"))
  }

  /** [[score]] serving a TRAINED weight table: `weights(b)` replaces
    * the LCG step for bucket `b = pmod(xxhash64(token),
    * weights.length)`; the doc score is the mean token weight and the
    * keep gate is mean > 0. The table ships once per task closure
    * inside the native [[graft.functions.HashedWeightScore]] expression
    * and per-row work stays one hash + one array read per token, fused
    * into whole-stage codegen.
    *
    * Same null contract as [[score]]: null text -> n_tokens 0,
    * w_sum 0.0, keep false.
    *
    * The portable-md5 scheme (weights.length must equal [[NumBuckets]])
    * evaluates `element_at` against the literal table instead — every
    * step replayable in SQL, which is how `text_quality_trained` is
    * oracle-gated.
    *
    * @return (id, n_tokens, w_sum, score, keep) — w_sum is the exact
    *         double weight sum; score = round(w_sum / n_tokens, 4)
    */
  def scoreWithWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: Seq[Double],
      scheme: HashScheme = XxHash64Scheme): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val toks = TextFunctions.tokens(col(textCol))
    val wSum = scheme match {
      case XxHash64Scheme =>
        org.apache.spark.sql.GraftColumnShim.column(
          graft.functions.HashedWeightScore(
            org.apache.spark.sql.GraftColumnShim.expression(toks), weights))
      case _ =>
        require(weights.length == NumBuckets,
          s"portable scheme buckets by $NumBuckets; got ${weights.length} weights")
        aggregate(
          transform(toks, t => element_at(typedlit(weights), (scheme.bucket(t) + 1).cast("int"))),
          lit(0.0),
          (acc, v) => acc + v)
    }
    df.select(
        col(idCol).as("id"),
        coalesce(size(toks).cast("long"), lit(0L)).as("n_tokens"),
        coalesce(wSum, lit(0.0)).as("w_sum"))
      .select(
        col("id"),
        col("n_tokens"),
        col("w_sum"),
        when(col("n_tokens") > 0L,
          round(col("w_sum") / col("n_tokens").cast("double"), 4) + 0.0).as("score"),
        (col("w_sum") > 0.0).as("keep"))
  }

  /** Distributed trainer producing the weight table [[scoreWithWeights]]
    * serves — full-batch logistic gradient descent over the SAME hashed
    * representation the serving path evaluates: a document's features
    * are its L1-normalized bucket counts (x_b = count_b / n_tokens,
    * buckets from `pmod(xxhash64(token), numBuckets)`), so the trained
    * decision value w·x IS the serving score (mean token weight) and
    * the serving gate `w_sum > 0` is exactly the trained decision
    * boundary — no train/serve skew.
    *
    * Each epoch is ONE `treeAggregate` over the corpus: every partition
    * folds its documents' residual-weighted features into a dense
    * buckets-length gradient array, partials combine pairwise up a tree
    * (no shuffle of the corpus — only O(numBuckets) arrays move), and
    * one final array reaches the driver for the weight update — the
    * classic distributed-GD shape (Spark MLlib's optimizer loop). The
    * bucketed doc representation is computed once and cached across
    * epochs; per-doc cost is O(tokens) per epoch. This is the rare
    * justified RDD use in graft: per-partition imperative accumulation
    * into a shared dense array, which no Column expression expresses.
    *
    * Docs with no tokens carry no gradient and are excluded up front
    * (the serving null contract already rejects them).
    *
    * Determinism: the gradient is a float sum whose partition combine
    * order may perturb last-ulp bits; the decision structure the spec
    * gates on is stable. The SERVING path stays bit-deterministic
    * regardless (weights are fixed once training ends).
    *
    * @param labelCol boolean or numeric 0/1 column; 1 = reference-like
    * @return the trained weight table, `numBuckets` long
    */
  def train(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      numBuckets: Int = NumBuckets,
      epochs: Int = 30,
      learningRate: Double = 2.0,
      l2: Double = 0.0): Array[Double] = {
    require(numBuckets > 0 && epochs > 0, "numBuckets and epochs must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.select(
        col(labelCol).cast("double").as("y"),
        transform(TextFunctions.tokens(col(textCol)),
          t => pmod(xxhash64(t), lit(numBuckets.toLong)).cast("int")).as("buckets"))
      .where(size(col("buckets")) > 0)
      .as[(Double, Array[Int])]
      .rdd
      .persist()
    val nDocs = data.count()
    require(nDocs > 0, "cannot train on a corpus with no tokenized documents")

    val w = new Array[Double](numBuckets)
    for (_ <- 1 to epochs) {
      val wCur = w.clone() // ship a stable snapshot in the task closure
      val grad = data.treeAggregate(new Array[Double](numBuckets))(
        seqOp = { (acc, doc) =>
          val (y, bs) = doc
          val inv = 1.0 / bs.length
          var z = 0.0
          var i = 0
          while (i < bs.length) { z += wCur(bs(i)); i += 1 }
          z *= inv
          val resid = 1.0 / (1.0 + math.exp(-z)) - y
          val g = resid * inv
          i = 0
          while (i < bs.length) { acc(bs(i)) += g; i += 1 }
          acc
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
      var i = 0
      while (i < numBuckets) {
        w(i) -= learningRate * (grad(i) / nDocs + l2 * w(i))
        i += 1
      }
    }
    data.unpersist()
    w
  }
}
