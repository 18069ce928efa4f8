package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * merge N ranked retrieval lists into one by scoring every document
  * `sum over lists of 1 / (c + rank)` — the standard hybrid-search
  * combiner for a sparse (BM25) and a dense (embedding ANN) ranking,
  * robust to the lists' incomparable raw scores because only ranks
  * enter the sum. No reference counterpart (retrieval extension
  * tier, sitting on top of [[Bm25]] and [[SimilaritySearch]]).
  *
  * Determinism contract: ranks are integers, and each contribution is
  * quantized as `floor(1e6 / (c + rank))` — for ranks and c in the
  * thousands the double division is orders of magnitude away from
  * the nearest rounding boundary, so the per-document score is an
  * exact integer sum that replays bit-for-bit in SQL, ties broken by
  * ascending id.
  *
  * Scale shape: input lists are top-k results — already tiny relative
  * to any corpus — so fusion is a union of k-row frames, one
  * map-combinable groupBy, and an ORDER+LIMIT the planner executes
  * as TakeOrderedAndProject. The expensive work stays inside the
  * per-list retrieval operators where it is already bounded.
  */
object RankFusion {

  /** Quantization scale of a reciprocal-rank contribution. */
  val Scale: Double = 1e6

  /** Fuse ranked lists, each a DataFrame with columns (`id`, `rank`)
    * where rank is 1-based. Returns the top `k` rows
    * (id, n_lists, score): how many lists ranked the document and
    * the rounded RRF score, best first, ties by ascending id.
    */
  def rrf(rankings: Seq[DataFrame], k: Int, c: Long = 60L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k > 0, "k must be positive")
    val contribs = rankings
      .map(_.select(
        col("id"),
        floor(lit(Scale) / (lit(c.toDouble) + col("rank").cast("double")))
          .cast("long").as("contrib")))
      .reduce(_.unionAll(_))
    contribs
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("score_q"))
      .orderBy(col("score_q").desc, col("id"))
      .limit(k)
      .select(col("id"), col("n_lists"),
        round(col("score_q").cast("double") / lit(Scale), 4).as("score"))
  }
}
