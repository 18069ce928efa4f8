package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-profiling and integrity-audit operators — the first look any
  * data platform takes at a new load: per-column null/distinct/range
  * statistics, and referential-integrity orphan counts between child
  * and parent tables.
  */
object Profiling {

  /** Per-column profile of the listed columns: row count, null count,
    * exact distinct count, min and max (cast to string so columns of
    * any orderable type share one report schema).
    *
    * Scale shape: one VALUE-GROUPED hash aggregation per column —
    * `groupBy(col).count` shrinks the column to its distinct values
    * (map-combinable, mutable-buffer hash agg all the way), and every
    * statistic falls out of that tiny grouped table. Each branch's
    * parquet scan prunes to its single column. The single-pass
    * multi-`countDistinct` alternative plans as Expand(xN) + a
    * SORT-based aggregate (string min/max buffers eject the hash
    * aggregate) — measured 4x slower at sf0.1. At 100 TB swap the
    * exact distinct for [[graft.functions.HyperLogLog]] with the same
    * report shape.
    *
    * @return (column, n, n_null, n_distinct, min_val, max_val), one
    *         row per profiled column
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns must exist: $cols vs ${df.columns.toSeq}")
    cols.map { c =>
      df.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c"))
        .agg(
          sum(col("__c")).as("__n"),
          sum(when(col("__v").isNull, col("__c")).otherwise(0L)).as("__nnull"),
          count(col("__v")).as("__ndist"),
          min(col("__v")).cast("string").as("__min"),
          max(col("__v")).cast("string").as("__max"))
        .select(lit(c).as("column"), col("__n").cast("long").as("n"),
          col("__nnull").cast("long").as("n_null"),
          col("__ndist").cast("long").as("n_distinct"),
          col("__min").as("min_val"), col("__max").as("max_val"))
    }.reduce(_.unionByName(_))
  }

  /** Mutual information between two categorical columns — the
    * dependency detector of a profiling pass (MI ~ 0 means the columns
    * are independent; high MI flags redundant columns, derived fields,
    * and leakage between a feature and a label):
    *
    *   MI = SUM_ab (c_ab/n) * ln(c_ab * n / (c_a * c_b))
    *
    * Per-cell contributions are floor-quantized to 1e-12-scaled longs
    * (the [[CorpusDrift]] replay discipline) so the scalar is an exact
    * sum in any order. One scan for the joint counts (output is
    * |A|x|B| cells); the margins join back on each key (cell-table
    * sized, never the corpus).
    *
    * @return one row: (n, n_cells, mi_nats)
    */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val joint = df.groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__cab"))
    val ma = joint.groupBy(col("__a")).agg(sum(col("__cab")).as("__ca"))
    val mb = joint.groupBy(col("__b")).agg(sum(col("__cab")).as("__cb"))
    val n1 = joint.agg(sum(col("__cab")).as("__n"))
    val contrib = joint
      .join(ma, "__a").join(mb, "__b").crossJoin(broadcast(n1))
      .select(col("__n"),
        floor(
          (col("__cab").cast("double") / col("__n").cast("double")) *
            log((col("__cab").cast("double") * col("__n").cast("double")) /
              (col("__ca").cast("double") * col("__cb").cast("double"))) *
            lit(CorpusDrift.ContribScale))
          .cast("long").as("__lp"))
    contrib
      .groupBy(col("__n"))
      .agg(count(lit(1)).as("__cells"), sum(col("__lp")).as("__mi"))
      .select(col("__n").cast("long").as("n"),
        col("__cells").cast("long").as("n_cells"),
        round(col("__mi").cast("double") / lit(CorpusDrift.ContribScale), 6)
          .as("mi_nats"))
  }

  /** Join/groupBy-key skew report — the diagnosis a 100 TB shuffle
    * gets BEFORE it runs ("will one key's partition spill while 31
    * cores idle?"): per-key count distribution summarized as discrete
    * rank percentiles, the heaviest key, and a Gini concentration
    * coefficient, all exact integers:
    *
    *   gini = (2·Σ rank·c − (K+1)·Σc) / (K·Σc)   (counts ascending)
    *
    * Scale shape: one map-combinable count aggregation (key-cardinality
    * sized), one ordered window over THAT table for ranks, one final
    * reduce. The raw table is touched once.
    *
    * @return one row: (n_rows, n_keys, max_count, top_key, p50_count,
    *         p99_count, gini_micro)
    */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
    // both windows share the one ascending sort of the keys-sized table
    val w = Window.orderBy(col("__c"), col("__k"))
    val ranked = counts
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__kn",
        count(lit(1)).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).cast("long"))
    ranked.agg(
      sum(col("__c")).cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_keys"),
      max(col("__c")).cast("long").as("max_count"),
      max_by(col("__k"), struct(col("__c"), col("__k"))).as("top_key"),
      max(when(col("__r") === expr("(__kn + 1) div 2"), col("__c")))
        .cast("long").as("p50_count"),
      max(when(col("__r") === expr("(99 * __kn + 99) div 100"), col("__c")))
        .cast("long").as("p99_count"),
      sum(col("__r") * col("__c")).as("__rc"))
      .select(col("n_rows"), col("n_keys"), col("max_count"), col("top_key"),
        col("p50_count"), col("p99_count"),
        expr("(2 * __rc - (n_keys + 1) * n_rows) * 1000000 div (n_keys * n_rows)")
          .as("gini_micro"))
  }

  /** Referential-integrity orphan count: child rows whose key has no
    * match in the parent. One anti-join per relation (broadcast when
    * the parent's key projection is small, sort-merge otherwise — and
    * bucket both sides by key at 100 TB for a shuffle-free check).
    *
    * @return one row: (relation, n_children, n_orphans)
    */
  def orphanCount(
      relation: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame = {
    val orphans = child
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
    child.agg(count(lit(1)).as("__nc"))
      .crossJoin(broadcast(orphans.agg(count(lit(1)).as("__no"))))
      .select(lit(relation).as("relation"),
        col("__nc").cast("long").as("n_children"),
        col("__no").cast("long").as("n_orphans"))
  }

  /** Blocking-quality audit for entity resolution (the two standard
    * record-linkage metrics, Christen 2012): REDUCTION RATIO — the
    * fraction of the all-pairs comparison space the blocking scheme
    * eliminates — and PAIR COMPLETENESS — the fraction of known true
    * matches the scheme keeps co-blocked (a missed true pair can never
    * be found downstream, however good the verifier). Both are exact
    * integer ratios on the micro grid, so the audit replays on any
    * engine; `truthPairs` is a labeled sample, the standard proxy.
    *
    * Scale shape: one block-size aggregation (block-cardinality-sized
    * output) + two joins of the (small) truth-pair sample against the
    * block assignment. The quadratic spaces are COUNTED in closed form
    * (`n·(n−1)/2`), never materialized.
    *
    * @return one row: (n_records, n_blocks, cand_pairs, truth_pairs,
    *         truth_coblocked, rr_micro, pc_micro)
    */
  def blockingQuality(
      records: DataFrame,
      idCol: String,
      blockCol: Column,
      truthPairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val blocked = records
      .select(col(idCol).as("__id"), blockCol.as("__bk"))
      .persist()
    val blockStats = blocked.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__n"))
      .agg(
        count(lit(1)).as("__nblocks"),
        sum(expr("__n * (__n - 1) div 2")).as("__cand"))
    val recStats = blocked.agg(count(lit(1)).as("__nrec"))
    val truth = truthPairs.select(col(aCol).as("__ta"), col(bCol).as("__tb"))
    val truthStats = truth
      .join(blocked.select(col("__id").as("__ta"), col("__bk").as("__ba")), Seq("__ta"), "left")
      .join(blocked.select(col("__id").as("__tb"), col("__bk").as("__bb")), Seq("__tb"), "left")
      .agg(
        count(lit(1)).as("__ntruth"),
        sum(when(col("__ba").isNotNull && col("__ba") === col("__bb"), 1L)
          .otherwise(0L)).as("__hits"))
    val out = recStats
      .crossJoin(broadcast(blockStats))
      .crossJoin(broadcast(truthStats))
      .select(
        col("__nrec").cast("long").as("n_records"),
        col("__nblocks").cast("long").as("n_blocks"),
        col("__cand").cast("long").as("cand_pairs"),
        col("__ntruth").cast("long").as("truth_pairs"),
        col("__hits").cast("long").as("truth_coblocked"),
        // degenerate inputs (fewer than 2 records / empty truth) yield
        // null ratios instead of an ANSI division-by-zero error; the
        // *1000000 scaling runs in decimal(38,0) so pair counts past
        // ~9.2e12 (n_records > ~4.3M) don't wrap Long
        expr("CASE WHEN __nrec >= 2 THEN cast(" +
          "cast(cast(__nrec as decimal(38,0)) * (__nrec - 1) div 2 - __cand as decimal(38,0)) " +
          "* 1000000 div (cast(__nrec as decimal(38,0)) * (__nrec - 1) div 2) as long) " +
          "END").as("rr_micro"),
        expr("CASE WHEN __ntruth > 0 THEN " +
          "cast(cast(__hits as decimal(38,0)) * 1000000 div __ntruth as long) END")
          .as("pc_micro"))
    out.persist().count()
    blocked.unpersist()
    out
  }
}
