package graft.operators

import graft.functions.{TextFunctions => TF}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed-n-gram importance weights
  * (Xie et al. 2023, arXiv:2302.03169): estimate a target and a raw
  * unigram+bigram distribution over a small hashed feature space,
  * then weight every raw document by its grams' summed
  * log-likelihood ratio — documents that "read like" the target
  * corpus score high and get selected. The public recipe behind
  * "select web data that looks like Wikipedia" pretraining curation;
  * no reference counterpart (LLM-pipeline extension tier, the
  * importance-weighting sibling of [[QualityClassifier]]'s
  * discriminative scorer).
  *
  * Determinism contract: gram->bucket hashing is the portable
  * md5-derived 60-bit hash mod `buckets` (the repo-wide scheme,
  * cf. [[QualityClassifier]]), bucket log-ratios are floor-quantized
  * to 1e-6-scaled longs, and a document's weight is the exact
  * integer SUM of its grams' quantized ratios — order-free, so
  * ranking and ties replay bit-for-bit in the DuckDB oracle.
  *
  * Scale shape (DSIR's own design point): the "language model" is a
  * `buckets`-cell table built by ONE map-combinable aggregation over
  * the corpus (a conditional count pair per cell — the target flag
  * rides the same scan, so target and raw counts cost one pass),
  * collected bounded (`buckets` rows) and shipped in the task
  * closure; scoring is then a stateless zero-shuffle fold per
  * document and selection is ORDER+LIMIT (TakeOrderedAndProject,
  * never a global sort). Nothing scales with corpus size except the
  * two scans themselves.
  */
object Dsir {

  /** Quantization scale of the per-bucket log-ratio. */
  val Scale: Double = 1e6

  /** Unigram + bigram array over whitespace tokens (bigrams empty for
    * single-token documents — no whole-text fallback here, unlike
    * [[TF.ngramsFromTokens]]: the feature space is the union, so a
    * duplicate of the unigram would double-count it).
    */
  def grams(toks: Column): Column =
    concat(
      toks,
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1), i => concat_ws(" ", slice(toks, i, lit(2)))))
        .otherwise(array().cast("array<string>")))

  /** Portable hashed feature bucket of a gram in `[0, buckets)`. */
  def bucketOf(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 15), 16, 10).cast("long"), lit(buckets.toLong))

  /** Per-bucket quantized log-likelihood ratios
    * `floor(ln(p_target / p_raw) * 1e6)` with add-1 smoothing,
    * dense over all `buckets` cells. `isTarget` flags the rows whose
    * grams define the target distribution (e.g. `col("lang") ===
    * "en"`); every row feeds the raw distribution. One scan, one
    * map-combinable aggregation, one bounded collect.
    */
  def bucketLogRatios(
      corpus: DataFrame,
      textCol: String,
      isTarget: Column,
      buckets: Int): Array[Long] = {
    require(buckets > 0, "buckets must be positive")
    val cells = corpus
      .select(isTarget.as("t"), TF.tokens(col(textCol)).as("toks"))
      .select(col("t"), explode(grams(col("toks"))).as("g"))
      .select(col("t"), bucketOf(col("g"), buckets).as("b"))
      .groupBy(col("b"))
      .agg(
        count(lit(1)).as("c_r"),
        count_if(col("t")).as("c_t"))
      .collect() // bounded: at most `buckets` rows
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2)))
      .toMap
    val nR = cells.valuesIterator.map(_._1).sum
    val nT = cells.valuesIterator.map(_._2).sum
    Array.tabulate(buckets) { b =>
      val (cR, cT) = cells.getOrElse(b, (0L, 0L))
      // the exact expression the oracle replays: two smoothed
      // probabilities, their ratio, libm ln, floor at 1e-6 grid
      val pT = (cT + 1).toDouble / (nT + buckets).toDouble
      val pR = (cR + 1).toDouble / (nR + buckets).toDouble
      math.floor(math.log(pT / pR) * Scale).toLong
    }
  }

  /** Importance score projection: (id, n_grams, weight_q) where
    * `weight_q` is the exact integer sum of the document's grams'
    * quantized log-ratios. Stateless — the `ratios` table rides the
    * task closure; zero shuffle.
    */
  def scored(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ratios: Array[Long]): DataFrame = {
    val buckets = ratios.length
    val lr = typedLit(ratios.toSeq)
    docs
      .select(col(idCol).as("id"), TF.tokens(col(textCol)).as("toks"))
      .select(col("id"), grams(col("toks")).as("g"))
      .select(
        col("id"),
        size(col("g")).cast("long").as("n_grams"),
        aggregate(col("g"), lit(0L),
          (acc, g) => acc + element_at(lr, (bucketOf(g, buckets) + 1).cast("int")))
          .as("weight_q"))
  }

  /** Top-`n` documents by importance weight (ties by ascending id):
    * (id, n_grams, weight), weight rounded to 4 at the boundary.
    */
  def select(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ratios: Array[Long],
      n: Int): DataFrame =
    scored(docs, idCol, textCol, ratios)
      .orderBy(col("weight_q").desc, col("id"))
      .limit(n)
      .select(col("id"), col("n_grams"),
        round(col("weight_q").cast("double") / lit(Scale), 4).as("weight"))
}
