package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (the CCNet / RefinedWeb pass):
  * lines that recur across many DISTINCT documents — headers, footers,
  * cookie banners, navigation chrome — are deleted from every document
  * while each document's unique content survives in order. The
  * line-granularity sibling of [[TextDedup.removeDupSpans]] (which
  * dedups token n-gram spans inside near-dup pairs); this pass is
  * corpus-global and runs BEFORE document-level dedup in a real
  * pipeline, because shared chrome otherwise inflates every document
  * similarity.
  *
  * Scale shape: one explode, one (line -> distinct-doc-count)
  * aggregation — two-stage: `distinct(line, doc)` collapses map-side,
  * then a map-combinable count — and one join of the exploded lines
  * against the frequent set. The frequent set is tiny by construction
  * (boilerplate IS the high-frequency tail), so Spark broadcasts it
  * under AQE; with `hashedKeys` (the default) the count and join
  * shuffles carry 8-byte xxhash64 line keys instead of raw line
  * strings — the gated query keeps string keys because its DuckDB
  * oracle replays them (same convention as `dedup_spans`).
  * Reconstruction is one per-document aggregation (sort the surviving
  * (pos, line) structs, join with the separator) — no window, no
  * second corpus scan.
  */
object LineDedup {

  /** Per-line corpus statistics: distinct-document count and total
    * occurrence count per exact line. Returns (line, n_docs, n_occ).
    */
  def lineStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sep: String = "\n"): DataFrame =
    docs
      .select(col(idCol).as("__doc"), explode(split(col(textCol), sep)).as("line"))
      .groupBy(col("line"))
      .agg(
        countDistinct(col("__doc")).as("n_docs"),
        count(lit(1)).as("n_occ"))

  /** Remove every line that occurs in at least `minDocs` distinct
    * documents; remaining lines rejoin in original order. Documents
    * reduced to nothing survive with empty text (dropping them is the
    * caller's policy decision, e.g. a min-length quality gate).
    * Returns the input's id column plus (`textCol` cleaned,
    * `removed_lines`, `kept_lines`).
    */
  def removeFrequentLines(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minDocs: Long = 10L,
      sep: String = "\n",
      hashedKeys: Boolean = true): DataFrame = {
    val key: Column => Column =
      if (hashedKeys) (c: Column) => xxhash64(c) else (c: Column) => c
    val lines = docs
      .select(col(idCol).as("__doc"), posexplode(split(col(textCol), sep)).as(Seq("pos", "line")))
      .withColumn("__k", key(col("line")))
    // distinct first: the per-line distinct-doc count becomes a plain
    // map-combinable count over (key, doc) pairs
    val frequent = lines
      .select(col("__k"), col("__doc")).distinct()
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__k"))
    val flagged = lines
      .join(frequent.withColumn("__hit", lit(true)), Seq("__k"), "left")
    val rebuilt = flagged
      .groupBy(col("__doc"))
      .agg(
        concat_ws(sep,
          transform(
            array_sort(collect_list(
              when(col("__hit").isNull, struct(col("pos"), col("line"))))),
            x => x.getField("line"))).as("__clean"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("removed_lines"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("kept_lines"))
    docs
      .select(col(idCol))
      .join(rebuilt, col(idCol) === col("__doc"), "left")
      .select(
        col(idCol),
        coalesce(col("__clean"), lit("")).as(textCol),
        coalesce(col("removed_lines"), lit(0L)).as("removed_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"))
  }

  /** The frequent-line list itself (>= `minDocs` distinct documents),
    * collected to the driver for closure shipping. Bounded by
    * construction — boilerplate IS the high-frequency tail — and
    * guarded loud when it isn't (`maxLines`), because the list rides
    * every task closure of [[scrub]].
    */
  def frequentLines(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minDocs: Long = 10L,
      sep: String = "\n",
      maxLines: Int = graft.functions.ScrubLines.MaxLines): Array[String] = {
    val freq = lineStats(docs, idCol, textCol, sep)
      .filter(col("n_docs") >= minDocs)
      .select(col("line"))
    val collected = freq.limit(maxLines + 1).collect().map(_.getString(0))
    require(collected.length <= maxLines,
      s"frequent-line set exceeds $maxLines entries — raise minDocs or maxLines " +
        "(a set this large is no longer boilerplate and should stay distributed)")
    collected
  }

  /** STATELESS line scrub against a pre-computed frequent-line list
    * ([[graft.functions.ScrubLines]]): a pure projection, so it is
    * append-mode streaming-legal — the serving half that lets a batch-
    * derived boilerplate list clean an infinite stream with no state
    * store. Equals [[removeFrequentLines]] when `lines` comes from
    * [[frequentLines]] over the same corpus (StreamLineDedupSpec).
    */
  def scrub(
      docs: DataFrame,
      lines: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      sep: String = "\n"): DataFrame = {
    val scrubbed = org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.ScrubLines(
        org.apache.spark.sql.GraftColumnShim.expression(col(textCol)), lines, sep))
    docs.select(
      col(idCol),
      scrubbed.getField("text").as(textCol),
      scrubbed.getField("removed_lines").as("removed_lines"),
      scrubbed.getField("kept_lines").as("kept_lines"))
  }
}
