package graft.operators

import graft.functions.VectorFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * - [[bruteForceTopK]]: the exact baseline — broadcast the query
  *   vector, one codegen'd scan computing cosine, `ORDER BY ... LIMIT k`
  *   (Spark's TakeOrderedAndProject: no global sort, per-partition
  *   top-k + driver merge).
  * - [[lshTopK]]: the scale path — random-hyperplane signatures prune
  *   the scan to vectors within `maxHamming` bits of the query's
  *   signature before exact cosine. Signatures are per-row arithmetic;
  *   at 100 TB the win comes from skipping the dot product (64 mults)
  *   for the ~(1 - recall-band) of rows that fail the cheap popcount
  *   test, and from persisting signatures as a table column so repeated
  *   queries never rescan raw vectors.
  * - [[embeddingNearDupPairs]]: near-duplicate detection — bucket by
  *   full signature, verify candidates with exact cosine.
  */
object SimilaritySearch {

  /** Exact cosine top-k of `embeddings` vs the single row in `query`
    * (both with `idCol` + `vecCol`). Returns (id, cos) descending.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      query: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = query.select(col(vecCol).as("__qv"))
    embeddings
      .crossJoin(broadcast(q))
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), col("__qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** LSH-pruned cosine top-k: only vectors whose hyperplane signature is
    * within `maxHamming` bits of the query's signature get an exact
    * cosine. Recall < 1 by construction; raise `maxHamming` or `bits`
    * to trade cost for recall.
    */
  def lshTopK(
      embeddings: DataFrame,
      query: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 32,
      maxHamming: Int = 8,
      seed: Int = 41): DataFrame = {
    val q = query.select(
      col(vecCol).as("__qv"),
      VectorFunctions.hyperplaneSignature(col(vecCol), bits, seed).as("__qsig"))
    // spread-to-cores is CONDITIONAL (TextDedup.spreadToCores): a
    // many-partition corpus flows through with no exchange — the
    // signature filter runs directly over the scan
    TextDedup.spreadToCores(embeddings)
      .withColumn("__sig", VectorFunctions.hyperplaneSignature(col(vecCol), bits, seed))
      .crossJoin(broadcast(q))
      .filter(VectorFunctions.hammingDistance(col("__sig"), col("__qsig")) <= maxHamming)
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), col("__qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Hard-negative mining for contrastive training: for EACH query
    * vector, the top-k most-similar corpus vectors whose label
    * DIFFERS from the query's — the "looks alike, isn't" examples a
    * triplet/InfoNCE trainer wants, mined corpus-wide instead of
    * sampled in-batch.
    *
    * Scale shape: the query set broadcasts (it is the bounded side by
    * construction — a training batch, not the corpus), ONE corpus
    * scan scores every (query, candidate) pair with the codegen'd
    * cosine, and the per-query top-k runs as a window partitioned by
    * query id — nq · corpus scored rows shuffle on query id, the
    * brute-force-per-query baseline exactly like [[bruteForceTopK]]
    * repeated, amortized into one scan. For corpus-scale query sets,
    * mine through the IVF/PQ index instead.
    *
    * @return (query_id, neg_id, neg_label, cos, rank), rank 1..k by
    *         descending cosine (ties by candidate id)
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      cosineFn: (Column, Column) => Column = VectorFunctions.cosine): DataFrame = {
    require(k > 0, "k must be positive")
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      col(labelCol).as("__qlabel"))
    val scored = TextDedup.spreadToCores(corpus)
      .crossJoin(broadcast(q))
      .filter(col(labelCol) =!= col("__qlabel") && col(idCol) =!= col("query_id"))
      .select(
        col("query_id"),
        col(idCol).as("neg_id"),
        col(labelCol).as("neg_label"),
        cosineFn(col(vecCol), col("__qv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neg_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Group-centroid similarity map: the pairwise cosine between the
    * MEAN embedding of every group (label, source, domain…) — the
    * corpus-analysis table mixture design reads ("which domains are
    * semantically close?"). Uses the identity cos(mean_a, mean_b) =
    * cos(sum_a, sum_b) (the 1/n factors cancel), so only exact
    * decimal coordinate SUMS are ever computed — no division until
    * the final cosine, which keeps the whole thing SQL-replayable.
    *
    * Scale shape: one posexplode + map-combinable decimal sum whose
    * output is (groups × dims) — tiny; the pairwise stage joins the
    * centroid table to itself on position (groups², still tiny). The
    * corpus is scanned exactly once.
    *
    * @return (group_a, group_b, cos), group_a < group_b, cosine of
    *         the two group centroids (raw double; round at the edge)
    */
  def groupCentroidSimilarity(
      df: DataFrame,
      groupCol: String,
      vecCol: String): DataFrame = {
    val sums = df
      .select(col(groupCol).as("__g"), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col("__g"), col("__p"))
      .agg(sum(col("__x").cast("double").cast("decimal(28,14)")).as("__sx"))
      .select(col("__g"), col("__p"), col("__sx").cast("double").as("__sx"))
    val a = sums.select(col("__g").as("group_a"), col("__p"), col("__sx").as("__xa"))
    val b = sums.select(col("__g").as("group_b"), col("__p"), col("__sx").as("__xb"))
    a.join(b, Seq("__p"))
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(
        sum((col("__xa") * col("__xb")).cast("decimal(30,14)")).as("__dot"),
        sum((col("__xa") * col("__xa")).cast("decimal(30,14)")).as("__na"),
        sum((col("__xb") * col("__xb")).cast("decimal(30,14)")).as("__nb"))
      .select(col("group_a"), col("group_b"),
        (col("__dot").cast("double") /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double")))).as("cos"))
  }

  /** Embedding near-duplicate pairs: vectors sharing the full `bits`-bit
    * hyperplane signature are candidates; exact cosine must clear
    * `minCosine`. Returns (id_a, id_b, cos), id_a < id_b.
    *
    * Scale guards (same pattern as [[graft.operators.TextDedup
    * .minhashCandidatePairs]]): signature buckets larger than
    * `maxBucketSize` are dropped — a popular signature (a near-dup
    * cluster, zero vectors, low-entropy embeddings) is m^2/2 pairs and
    * is a duplicate *group*, not a pair problem — and the bucket
    * self-join carries ids only; the full vectors join back exactly
    * once per surviving distinct pair instead of riding both sides of
    * the bucket shuffle.
    *
    * Eagerly materialized; the returned DataFrame is persisted and the
    * intermediate cache released.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int = 16,
      minCosine: Double = 0.95,
      seed: Int = 41,
      maxBucketSize: Int = 2000,
      cosineFn: (Column, Column) => Column = VectorFunctions.cosine): DataFrame = {
    // persist: signatures would otherwise be recomputed on both join sides
    val sigs = TextDedup.spreadToCores(embeddings)
      .select(
        col(idCol).as("id"),
        col(vecCol).as("vec"),
        VectorFunctions.hyperplaneSignature(col(vecCol), bits, seed).as("sig"))
      .persist()
    val idsig = sigs.select(col("sig"), col("id"))
    val bucketSizes = idsig.groupBy(col("sig"))
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") <= maxBucketSize)
      .drop("__bucket_n")
    val bounded = idsig.join(bucketSizes, Seq("sig"))
    val a = bounded.select(col("sig"), col("id").as("id_a"))
    val b = bounded.select(col("sig"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val result = candidates
      .join(sigs.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        cosineFn(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= minCosine)
    TextDedup.materialized(result, Seq(sigs))
  }
}
