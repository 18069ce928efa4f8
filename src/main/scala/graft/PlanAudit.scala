package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{ExpandExec, GenerateExec, GlobalLimitExec, LocalLimitExec, LocalTableScanExec, SparkPlan, UnionExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Standing plan-shape audit over EVERY SparkEntry query — the
  * per-round "no quadratic joins crept in" check as a tool instead of
  * a hand grep, with a PRINCIPLED acceptance rule instead of a
  * per-query allowlist:
  *
  *   - `CartesianProductExec` — never acceptable; the audit FAILS.
  *   - `BroadcastNestedLoopJoinExec` — acceptable ONLY when the
  *     BROADCAST side's logical plan has a statically-bounded row
  *     count (`maxRows` <= [[MaxBroadcastRows]]): that is exactly the
  *     repo's sanctioned `crossJoin(broadcast(<one-row aggregate or
  *     clamped query set>))` shape — Catalyst derives maxRows = 1 for
  *     ungrouped aggregates and = n for local/limited relations, and
  *     derives NOTHING for corpus-sized sides, so a bnlj whose build
  *     side could grow with the data fails the audit by construction.
  *   - `Exchange` / `WholeStageCodegen` counts — informational trend
  *     columns (shuffle count and codegen coverage).
  *
  * AQE is disabled in the audit session so the physical tree is
  * traversable (AdaptiveSparkPlanExec hides its inner plan from
  * collect) — join SHAPE is decided by the same static planning
  * either way. Building a query's DataFrame runs its driver-side
  * staging (bounded collects, store builds) but never executes the
  * audited plan itself — run at sf0.001.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [outJson]
  */
object PlanAudit {

  /** A broadcast-nested-loop build side must be provably at most this
    * many rows — covers one-row verdict/total aggregates and the
    * clamped query sets (tens of rows by construction).
    */
  val MaxBroadcastRows = 100L

  /** Queries whose bnlj build side is a QUERY SET selected by an id
    * modulus/range filter over a scan (`vec_id % 50 = 0`,
    * `vec_id < 24`, ...): tens of rows by construction — the
    * sanctioned brute-force-over-a-bounded-query-set shape the ANN
    * variants exist to replace at corpus scale — but a data-dependent
    * bound Catalyst cannot derive statically, hence named here with
    * the max bnlj nodes each plan may carry. Adding a NAME to this
    * map requires the same justification; raising a COUNT means a new
    * unkeyed join appeared and must be re-audited by hand.
    */
  val QuerySetBnlj: Map[String, Int] = Map(
    "ann_ivf_fullprobe" -> 1,
    "ann_ivf_topk" -> 1,
    "ann_lsh_topk" -> 1,
    "ann_quantized_rerank" -> 2,
    "bitext_mine" -> 3,
    "bitext_mine_ann" -> 1,
    "hard_negatives" -> 1,
    "knn_classify" -> 1,
    "knn_eval" -> 1,
    "knn_graph" -> 1,
    "knn_graph_ann" -> 1,
    "rrf_fusion" -> 1,
    "semantic_clusters_ann" -> 1,
    "simsearch_cosine" -> 1,
    "simsearch_quantized" -> 1)

  /** Static row bound of a physical subtree, derived from the plan
    * itself (logicalLink is unset under codegen wrappers): a FINAL
    * ungrouped aggregate is one row, local scans and limits are
    * literal, and every single-child operator that cannot MULTIPLY
    * rows (project/filter/sort/exchange/codegen wrappers) passes its
    * child's bound through. Generate/Expand multiply and joins
    * compound, so they stop the derivation — an unbounded result is
    * the conservative answer.
    */
  private def boundedRows(p: SparkPlan): Option[Long] = p match {
    case a: BaseAggregateExec =>
      // only the FINAL mode emits one global row; a partial ungrouped
      // aggregate is one row PER PARTITION, but the final sits above
      // it, so seeing any ungrouped aggregate from the top is Some(1)
      if (a.groupingExpressions.isEmpty) Some(1L) else None
    case l: LocalTableScanExec => Some(l.rows.size.toLong)
    case l: LocalLimitExec => Some(l.limit.toLong)
    case g: GlobalLimitExec => Some(g.limit.toLong)
    case u: UnionExec =>
      val bounds = u.children.map(boundedRows)
      if (bounds.forall(_.isDefined)) Some(bounds.flatten.sum) else None
    case _: GenerateExec | _: ExpandExec => None
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      boundedRows(r.child) // a leaf wrapper around the original exchange
    case other if other.children.size == 1 => boundedRows(other.children.head)
    case _ => None
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.drop(1).headOption.getOrElse("PLAN_AUDIT.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failures = List.empty[String]
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        var cart, bnljOk, bnljBad = 0
        plan.foreachWithSubqueries {
          case _: CartesianProductExec =>
            cart += 1
            failures ::= s"$name: CartesianProduct"
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case BuildRight => j.right
              case BuildLeft => j.left
            }
            boundedRows(build) match {
              case Some(n) if n <= MaxBroadcastRows => bnljOk += 1
              case _ => bnljBad += 1
            }
          case _ =>
        }
        val allowed = QuerySetBnlj.getOrElse(name, 0)
        if (bnljBad > allowed)
          failures ::= s"$name: $bnljBad BroadcastNestedLoopJoin with " +
            s"unbounded build side ($allowed allowed as query-set broadcasts)"
        var exch, wsc = 0
        plan.foreachWithSubqueries {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => exch += 1
          case _: org.apache.spark.sql.execution.WholeStageCodegenExec => wsc += 1
          case _ =>
        }
        s""""$name":{"cartesian":$cart,"bnlj_bounded":$bnljOk,"bnlj_unbounded":$bnljBad,"exchanges":$exch,"codegen_spans":$wsc}"""
      } catch {
        case e: Throwable =>
          failures ::= s"$name: audit error ${e.getClass.getSimpleName}"
          s""""$name":{"error":"${e.getClass.getSimpleName}"}"""
      }
    }
    val verdict = if (failures.isEmpty) "clean" else "FAILED"
    val doc =
      s"""{"sf":"$sfDir","verdict":"$verdict","max_broadcast_rows":$MaxBroadcastRows,"failures":[${failures.reverse.map("\"" + _ + "\"").mkString(",")}],
         |"queries":{${rows.mkString(",\n")}}}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      doc.getBytes("UTF-8"))
    println(s"[plan-audit] ${rows.size} queries -> $out; verdict $verdict")
    failures.reverse.foreach(f => System.err.println(s"[plan-audit] $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
