package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-level corpus controls — the RefinedWeb/C4-style steps that
  * act on a document's source site rather than its content: extract
  * the registrable host from a URL, cap how many documents any one
  * domain may contribute (a handful of boilerplate-heavy sites
  * otherwise dominate a web corpus), and report per-domain stats.
  *
  * Scale shape: the cap is ONE shuffle by domain; Spark 4 plans the
  * `row_number <= cap` filter as a WindowGroupLimit, so each map task
  * keeps only `cap` candidates per domain before the exchange — a
  * skewed mega-domain (the exact case the operator exists for) is
  * bounded map-side, not collected onto one reducer. Selection is
  * deterministic (md5 rank, ties by id), never RNG state.
  */
object DomainOps {

  /** Lowercased host of an http(s) URL; empty string when the value
    * does not parse as one (ports and paths excluded). The regex is
    * RE2-portable — DuckDB's regexp_extract replays it verbatim.
    */
  def extractDomain(url: Column): Column =
    lower(regexp_extract(url, "^https?://([^/:]+)", 1))

  /** Keep at most `cap` documents per domain, chosen by deterministic
    * hash rank (md5 of the id, ties by id) so the selection is
    * reproducible across runs and engines.
    *
    * @return input rows that survive the cap, plus (domain, rk)
    */
  def capPerDomain(
      df: DataFrame,
      domain: Column,
      idCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(col("domain"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("domain", domain)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
  }

  /** Per-domain document counts plus how many survive a `cap` — the
    * report that decides cap values before running [[capPerDomain]].
    */
  def domainStats(df: DataFrame, domain: Column, cap: Int): DataFrame =
    df.groupBy(domain.as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        least(count(lit(1)), lit(cap.toLong)).as("n_kept"))
}
