package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** PageRank (Brin & Page 1998) over an edge table, on the integer
  * µ-grid so every iteration is exact and cross-engine replayable
  * (the KMeansTrain/TopicAssign convention: ranks are BIGINT
  * micro-units, every update a floor-division — no float summation
  * order anywhere). The training-data use is link-graph quality weighting:
  * rank a domain/URL graph once, then join document quality by source
  * — the Common-Crawl-shaped sibling of the per-document quality
  * classifier.
  *
  * Non-normalized formulation with per-node teleport mass:
  * `r0 = Unit`, `r_{t+1}(v) = (1-d)*Unit + floor(d * sum_{u->v}
  * floor(r_t(u) / outdeg(u)))` with d = dampingNum/dampingDen applied
  * as exact integer multiply-then-floor-divide. Dangling-node mass
  * (no out-edges) is dropped, the standard simplified variant —
  * ranks then order identically to the normalized form on any fixed
  * graph.
  *
  * Scale shape: each iteration is ONE join (ranks x edges on src) and
  * ONE aggregation (sum of contributions by dst) — the canonical
  * co-partitionable pattern: at cluster scale, bucket both tables by
  * node id and every iteration is shuffle-free except the map-side
  * combinable sum. The driver loop is inherent to power iteration;
  * per-round eager materialization keeps lineage flat (the Clustering
  * precedent — recomputing through an unmaterialized AQE boundary
  * loses badly, NOTES.md).
  */
object PageRank {

  /** Rank in micro-units: the value every node starts with. */
  val Unit = 1000000L

  private def idiv(a: Column, b: Column): Column =
    GraftColumnShim.column(
      IntegralDivide(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Integer-grid power iteration.
    *
    * @param edges     (srcCol, dstCol) edge table; parallel edges count
    *                  multiply, self-loops are legal
    * @param nodes     node universe (one column named like srcCol's
    *                  values); nodes with no in-edges keep teleport mass
    * @param iters     power-iteration rounds (driver loop, inherent)
    * @return (node, rank_micro) — exact integers, deterministic
    */
  def rank(
      edges: DataFrame,
      nodes: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampingNum: Long = 85L,
      dampingDen: Long = 100L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampingNum > 0 && dampingDen > dampingNum, "damping must be in (0, 1)")
    val teleport = Unit * (dampingDen - dampingNum) / dampingDen
    val nodeCol = nodes.columns.head
    val allNodes = nodes.select(col(nodeCol).as("node")).distinct()
    // outdeg rides the edge rows once: (src, dst, d)
    val outdeg = edges
      .groupBy(col(srcCol).as("__src"))
      .agg(count(lit(1)).as("__d"))
    val edgesWithDeg = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(outdeg, "__src")
      .persist()
    edgesWithDeg.count()

    var ranks = allNodes.select(col("node"), lit(Unit).as("rank_micro")).persist()
    ranks.count()
    var i = 0
    while (i < iters) {
      val contribs = edgesWithDeg
        .join(ranks.select(col("node").as("__src"), col("rank_micro")), "__src")
        .select(col("__dst").as("node"), idiv(col("rank_micro"), col("__d")).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__c"))
      val next = allNodes
        .join(contribs, Seq("node"), "left")
        .select(
          col("node"),
          (lit(teleport) +
            coalesce(idiv(col("__c") * lit(dampingNum), lit(dampingDen)), lit(0L)))
            .as("rank_micro"))
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    edgesWithDeg.unpersist()
    ranks
  }

  /** Personalized PageRank (topic-sensitive restart, Haveliwala 2002):
    * identical integer-grid iteration, but teleport mass lands ONLY on
    * the `seeds` and the walk starts from them, so the converged mass
    * measures PROXIMITY TO THE SEED SET instead of global centrality —
    * the seed-propagation op of corpus curation ("score every domain
    * by its link-distance to these known-good domains"), the
    * link-graph analogue of the portable quality classifier's labeled
    * seeds. Same one-join-one-aggregation round as [[rank]], same
    * per-round lineage truncation; the seed table joins in as a
    * per-node teleport column (broadcast-or-hash — seed sets are
    * curated, small by construction).
    *
    * @return (node, rank_micro) — exact integers; non-seed nodes
    *         unreachable from the seeds rank exactly 0
    */
  def personalizedRank(
      edges: DataFrame,
      nodes: DataFrame,
      seeds: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      dampingNum: Long = 85L,
      dampingDen: Long = 100L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampingNum > 0 && dampingDen > dampingNum, "damping must be in (0, 1)")
    val teleport = Unit * (dampingDen - dampingNum) / dampingDen
    val nodeCol = nodes.columns.head
    val allNodes = nodes.select(col(nodeCol).as("node")).distinct()
    val seedNodes = seeds.select(col(seeds.columns.head).as("node")).distinct()
    val withSeed = allNodes
      .join(seedNodes.withColumn("__s", lit(1)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0)).as("__s"))
      .persist()
    withSeed.count()
    val outdeg = edges
      .groupBy(col(srcCol).as("__src"))
      .agg(count(lit(1)).as("__d"))
    val edgesWithDeg = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(outdeg, "__src")
      .persist()
    edgesWithDeg.count()

    var ranks = withSeed
      .select(col("node"), (col("__s") * lit(Unit)).cast("long").as("rank_micro"))
      .persist()
    ranks.count()
    var i = 0
    while (i < iters) {
      val contribs = edgesWithDeg
        .join(ranks.select(col("node").as("__src"), col("rank_micro")), "__src")
        .select(col("__dst").as("node"), idiv(col("rank_micro"), col("__d")).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__c"))
      val next = withSeed
        .join(contribs, Seq("node"), "left")
        .select(
          col("node"),
          (col("__s") * lit(teleport) +
            coalesce(idiv(col("__c") * lit(dampingNum), lit(dampingDen)), lit(0L)))
            .cast("long").as("rank_micro"))
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    edgesWithDeg.unpersist(); withSeed.unpersist()
    ranks
  }
}
