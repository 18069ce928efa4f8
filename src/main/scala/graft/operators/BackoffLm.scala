package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stupid-Backoff trigram language model (Brants et al. 2007, "Large
  * Language Models in Machine Translation") — the scoring scheme built
  * FOR corpus-scale distributed counts: no discounting, no
  * normalization pass, just raw relative frequencies with a fixed
  * back-off penalty, which is exactly what made it tractable at
  * Google-web scale and makes it the right perplexity-class signal for
  * a 100 TB pipeline (the add-one bigram model in [[NgramLm]] is the
  * smoothed/normalized sibling; this one trades normalization for
  * training that is NOTHING but three map-side-combinable counts).
  *
  * Score of token w with available context (v = previous, u = one
  * before that), with penalty α = 0.4:
  *
  *   S(w | u v) = c(uvw)/c(uv)        if c(uvw) > 0
  *              = α · S(w | v)        otherwise
  *   S(w | v)   = c(vw)/c(v)          if c(vw) > 0
  *              = α · S(w)            otherwise
  *   S(w)       = max(c(w), 1)/N     (unseen words behave as count 1)
  *
  * Tokens at positions 1 and 2 score from their shorter available
  * context with no penalty (nothing was backed off FROM).
  *
  * Scale shape: training = one stateless per-row context zip (an
  * array HOF — no window shuffle, no self-join) exploded once, then
  * three map-side-combinable counts whose output is vocabulary-sized,
  * not corpus-sized. Scoring explodes the scored slice and LEFT-joins
  * it to the count tables on their gram keys — AQE broadcasts
  * vocabulary-sized sides, hash-join otherwise; never all-pairs. The
  * per-position log-score is floor-quantized to a 1e-6 LONG before the
  * per-doc sum (the repo-wide integer-space discipline), so document
  * scores are exact under any partition order and replay in ANSI SQL.
  */
object BackoffLm {

  /** Scale of the quantized per-position log-score. */
  val LogProbScale: Double = 1e6

  /** Back-off penalty (the paper's recommended constant). */
  val Alpha: Double = 0.4

  /** Trained counts: `unigrams` (w, c1), `bigrams` (w1, w, c2),
    * `trigrams` (w2, w1, w, c3) — all persisted — plus total token
    * count. Release with [[Model.unpersist]].
    */
  final case class Model(
      unigrams: DataFrame,
      bigrams: DataFrame,
      trigrams: DataFrame,
      totalTokens: Long) {
    def unpersist(): Unit = {
      unigrams.unpersist(); bigrams.unpersist(); trigrams.unpersist(); ()
    }
  }

  /** Per-row (w, w1, w2) context triples from the token array — a
    * stateless HOF zip, no window, no shuffle. `w1`/`w2` are null at
    * the first/second position.
    */
  private def triples(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextDedup.spreadToCores(df)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(col("id"), explode(transform(col("__ts"), (x, i) =>
        struct(
          x.as("w"),
          when(i >= 1, element_at(col("__ts"), i)).as("w1"),
          when(i >= 2, element_at(col("__ts"), i - 1)).as("w2")))).as("e"))
      .select(col("id"), col("e.w").as("w"), col("e.w1").as("w1"), col("e.w2").as("w2"))

  /** Train: three count aggregations over one staged triple explode. */
  def train(corpus: DataFrame, idCol: String, textCol: String): Model = {
    val t = triples(corpus, idCol, textCol).persist()
    val uni = t.groupBy(col("w")).agg(count(lit(1)).as("c1")).persist()
    val big = t.filter(col("w1").isNotNull)
      .groupBy(col("w1"), col("w")).agg(count(lit(1)).as("c2")).persist()
    val tri = t.filter(col("w2").isNotNull)
      .groupBy(col("w2"), col("w1"), col("w")).agg(count(lit(1)).as("c3")).persist()
    val n = t.count()
    uni.count(); big.count(); tri.count()
    t.unpersist()
    Model(uni, big, tri, n)
  }

  /** Score `docs`: per document, token count, how many tokens scored
    * at each order (trigram / bigram / unigram — backed-off or
    * short-context alike), and the mean quantized log-score
    * (`avg_logs`, 4 decimals; null for empty docs).
    */
  def score(docs: DataFrame, model: Model, idCol: String, textCol: String): DataFrame = {
    val t = triples(docs, idCol, textCol)
    val uniW = model.unigrams
    val uniCtx = model.unigrams
      .select(col("w").as("w1"), col("c1").as("c1ctx"))
    val bigW = model.bigrams
    val bigCtx = model.bigrams
      .select(col("w1").as("w2"), col("w").as("w1"), col("c2").as("c2ctx"))
    val joined = t
      .join(model.trigrams, Seq("w2", "w1", "w"), "left")
      .join(bigW, Seq("w1", "w"), "left")
      .join(bigCtx, Seq("w2", "w1"), "left")
      .join(uniW, Seq("w"), "left")
      .join(uniCtx, Seq("w1"), "left")
    val dbl = (c: Column) => c.cast("double")
    val sUni = dbl(greatest(coalesce(col("c1"), lit(0L)), lit(1L))) / lit(model.totalTokens.toDouble)
    val sBig = dbl(col("c2")) / dbl(col("c1ctx"))
    val sTri = dbl(col("c3")) / dbl(col("c2ctx"))
    val haveTri = col("w2").isNotNull && col("c3").isNotNull
    val haveBig = col("w1").isNotNull && col("c2").isNotNull
    // penalty multiplies once per order SKIPPED, not per order used
    val s = when(haveTri, sTri)
      .when(haveBig, when(col("w2").isNotNull, lit(Alpha) * sBig).otherwise(sBig))
      .otherwise(
        when(col("w2").isNotNull, lit(Alpha) * lit(Alpha) * sUni)
          .when(col("w1").isNotNull, lit(Alpha) * sUni)
          .otherwise(sUni))
    val order = when(haveTri, lit(3)).when(haveBig, lit(2)).otherwise(lit(1))
    val scored = joined.select(
      col("id"),
      floor(log(s) * LogProbScale).cast("long").as("ls"),
      order.as("ord"))
    scored.groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("ord") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("ord") === 2, 1L).otherwise(0L)).as("n_big"),
        sum(when(col("ord") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(col("ls")).as("ls_sum"))
      .select(col("id"), col("n_tokens"), col("n_tri"), col("n_big"), col("n_uni"),
        round(col("ls_sum").cast("double") / lit(LogProbScale) / col("n_tokens").cast("double"), 4)
          .as("avg_logs"))
  }

  /** A driver-collected model for the stateless serving path —
    * bounded by construction ([[collectModel]] refuses above
    * `maxRows`).
    */
  final case class CollectedModel(
      trigrams: Map[(String, String, String), Long],
      bigrams: Map[(String, String), Long],
      unigrams: Map[String, Long],
      totalTokens: Long)

  /** Collect a trained model for closure shipping. Guarded: a model
    * past `maxRows` gram rows should score through the distributed
    * join form ([[score]]), not a task closure.
    */
  def collectModel(model: Model, maxRows: Long = 2000000L): CollectedModel = {
    val rows = model.unigrams.count() + model.bigrams.count() + model.trigrams.count()
    require(rows <= maxRows,
      s"model has $rows gram rows > $maxRows; use the join-based score " +
        "(or raise maxRows if the closure size is acceptable)")
    CollectedModel(
      model.trigrams.collect()
        .map(r => (r.getAs[String]("w2"), r.getAs[String]("w1"), r.getAs[String]("w")) ->
          r.getAs[Long]("c3")).toMap,
      model.bigrams.collect()
        .map(r => (r.getAs[String]("w1"), r.getAs[String]("w")) -> r.getAs[Long]("c2")).toMap,
      model.unigrams.collect()
        .map(r => r.getAs[String]("w") -> r.getAs[Long]("c1")).toMap,
      model.totalTokens)
  }

  /** One-pass per-row score of a token array against a collected
    * model — [[graft.functions.BackoffLmScore]], the stateless
    * projection that makes the score stream-legal.
    */
  def scoreColumn(toks: Column, model: CollectedModel): Column =
    org.apache.spark.sql.GraftColumnShim.column(graft.functions.BackoffLmScore(
      org.apache.spark.sql.GraftColumnShim.expression(toks),
      model.trigrams, model.bigrams, model.unigrams, model.totalTokens))

  /** Stateless-projection twin of [[score]]: same output schema and
    * (proven by differential spec) identical values; works on
    * streaming DataFrames because nothing aggregates across rows.
    */
  def scoreInline(
      docs: DataFrame,
      model: CollectedModel,
      idCol: String,
      textCol: String): DataFrame =
    docs.select(
        col(idCol).as("id"),
        scoreColumn(TextFunctions.tokens(col(textCol)), model).as("s"))
      .select(col("id"), col("s.n_tokens").as("n_tokens"),
        col("s.n_tri").as("n_tri"), col("s.n_big").as("n_big"),
        col("s.n_uni").as("n_uni"), col("s.avg_logs").as("avg_logs"))
}
