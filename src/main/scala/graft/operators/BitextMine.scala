package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-corpus mining (Artetxe & Schwenk 2019,
  * "Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings" — the CCMatrix/LASER method): a source/target pair is
  * parallel when its similarity stands OUT against each side's
  * neighborhood, not when it is merely high — the ratio margin
  *
  *   margin(x, y) = cos(x, y) / ((avgTopK_fwd(x) + avgTopK_bwd(y)) / 2)
  *
  * kills the hub sentences that plain cosine thresholds mis-pair.
  * Mined pairs are the MUTUAL argmax by margin above a threshold.
  *
  * Numeric contract (repo-wide integer-space discipline): similarities
  * ride the 1e-6 grid and the margin is one integral expression
  *
  *   margin_micro = sim*2e6*fcnt*bcnt div (fsum*bcnt + bsum*fcnt)
  *
  * (counts, not k, so sides with fewer than k counterparts average
  * over what exists) — exact under any partition order, replayed
  * bit-for-bit by the `bitext_mine` oracle.
  *
  * Scale shape: everything downstream of the candidate table is two
  * windowed top-k prunes keyed by src/tgt id (map-combinable after
  * row_number), two one-column aggregate joins, and two argmax
  * windows — all shuffles keyed by an id. The candidate table itself
  * is the scale lever: [[marginMineFromCandidates]] accepts LSH/IVF
  * bucket candidates (the [[SimilaritySearch.mutualKnnGraphAnn]]
  * composition); [[marginMine]] is the broadcast convenience for
  * BOUNDED sides, guarded like [[SimilaritySearch.mutualKnnGraph]].
  */
object BitextMine {

  /** Mine mutual-best pairs from a scored candidate table
    * (src_id, tgt_id, sim) with sim on the 1e-6 LONG grid.
    *
    * Negative sims are LEGAL input: raw cosines go negative routinely
    * and such pairs sit below any positive margin threshold, so they
    * prune themselves (the denominator filter below drops the only
    * degenerate case). Callers wanting a hard non-negative contract
    * (e.g. a pre-shifted grid where a negative means an upstream bug)
    * opt in with `validate = true` — one codegen'd comparison per row.
    *
    * @return (src_id, tgt_id, sim_micro, margin_micro), mutual argmax
    *         pairs with margin_micro >= minMarginMicro
    */
  def marginMineFromCandidates(
      cand: DataFrame,
      k: Int,
      minMarginMicro: Long,
      validate: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    val checked = if (!validate) cand else cand.withColumn("sim",
      when(col("sim") < 0, raise_error(concat(
        lit("marginMineFromCandidates: sim must be non-negative "),
        lit("(shift or clamp the grid at ingest); got "),
        col("sim").cast("string")))).otherwise(col("sim")))
    val wf = Window.partitionBy(col("src_id")).orderBy(col("sim").desc, col("tgt_id"))
    val wb = Window.partitionBy(col("tgt_id")).orderBy(col("sim").desc, col("src_id"))
    val fwd = checked.withColumn("__rk", row_number().over(wf)).filter(col("__rk") <= k)
      .groupBy(col("src_id"))
      .agg(sum(col("sim")).as("__fsum"), count(lit(1)).as("__fcnt"))
    val bwd = checked.withColumn("__rk", row_number().over(wb)).filter(col("__rk") <= k)
      .groupBy(col("tgt_id"))
      .agg(sum(col("sim")).as("__bsum"), count(lit(1)).as("__bcnt"))
    val scored = checked
      .join(fwd, Seq("src_id"))
      .join(bwd, Seq("tgt_id"))
      // with sims >= 0 the denominator is 0 only when BOTH
      // neighborhoods sum to zero — a sim-0 pair that no positive
      // margin threshold could mine; drop it rather than divide
      .filter(expr("__fsum * __bcnt + __bsum * __fcnt > 0"))
      // numerator in decimal(38,0): sim*2e6*k*k wraps Long past
      // k ~ 1500 (the Profiling.rr_micro lesson); DuckDB's int128
      // already gets this right
      .withColumn("margin_micro",
        expr("cast(cast(sim as decimal(38,0)) * 2000000 * __fcnt * __bcnt " +
          "div (__fsum * __bcnt + __bsum * __fcnt) as long)"))
      .select(col("src_id"), col("tgt_id"), col("sim"), col("margin_micro"))
    val bestF = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_micro").desc, col("tgt_id"))
    val bestB = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin_micro").desc, col("src_id"))
    scored
      .withColumn("__bf", row_number().over(bestF))
      .withColumn("__bb", row_number().over(bestB))
      .filter(col("__bf") === 1 && col("__bb") === 1 &&
        col("margin_micro") >= minMarginMicro)
      .select(col("src_id"), col("tgt_id"),
        col("sim").as("sim_micro"), col("margin_micro"))
  }

  /** Mine against an IVF-indexed target corpus — the at-scale
    * composition ([[SimilaritySearch.mutualKnnGraphAnn]]'s shape):
    * each source row selects its `nprobe` nearest inverted lists
    * in-plan ([[IvfAnn.probeListsCol]] — codegen'd against the literal
    * centroid matrix, no driver round-trip), candidates come from ONE
    * join keyed by list id (source-to-corpus, nothing broadcast, never
    * all-pairs), and [[marginMineFromCandidates]] mines the scored
    * pairs. Neighborhood averages are over the CANDIDATE sets — the
    * standard ANN-margin approximation; recall against the exact mine
    * is what the `bitext_mine_ann` gate's verdict asserts.
    */
  def marginMineAnn(
      src: DataFrame,
      idCol: String,
      vecCol: String,
      index: IvfAnn.Index,
      k: Int,
      minMarginMicro: Long,
      nprobe: Int,
      simFn: (Column, Column) => Column): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    val probing = src.select(col(idCol).as("src_id"), col(vecCol).as("__vs"),
      explode(IvfAnn.probeListsCol(col(vecCol), index.centroids, nprobe))
        .as("__pl"))
    val members = index.assigned.select(
      col("__id").as("tgt_id"), col("__vec").as("__vt"), col("__list").as("__pl"))
    val cand = probing.join(members, Seq("__pl"))
      .select(col("src_id"), col("tgt_id"),
        simFn(col("__vs"), col("__vt")).as("sim"))
    marginMineFromCandidates(cand, k, minMarginMicro)
  }

  /** Broadcast convenience for BOUNDED sides: score src x tgt with
    * `simFn` (must emit the 1e-6 LONG grid) and mine. The target side
    * broadcasts — guarded with the [[SimilaritySearch.mutualKnnGraph]]
    * contract; at corpus scale generate candidates from IVF/LSH
    * buckets and call [[marginMineFromCandidates]].
    */
  def marginMine(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      minMarginMicro: Long,
      simFn: (Column, Column) => Column,
      maxBroadcastNodes: Int = 1 << 20,
      knownTgtCount: Option[Long] = None): DataFrame = {
    val n = knownTgtCount.getOrElse(tgt.limit(maxBroadcastNodes + 1).count())
    require(n <= maxBroadcastNodes,
      s"marginMine broadcasts the target side, but it exceeds " +
        s"$maxBroadcastNodes rows — generate candidates from an IVF/LSH " +
        "index and call marginMineFromCandidates")
    val a = src.select(col(idCol).as("src_id"), col(vecCol).as("__vs"))
    val b = tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("__vt"))
    val cand = TextDedup.spreadToCores(a)
      .crossJoin(broadcast(b))
      .select(col("src_id"), col("tgt_id"), simFn(col("__vs"), col("__vt")).as("sim"))
    marginMineFromCandidates(cand, k, minMarginMicro)
  }
}
