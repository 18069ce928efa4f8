package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of (point-in-time) join.
  *
  * For every left row, attach the payload of the newest right row with the
  * same key and `rightTs <= leftTs` (or null if none). Spark has no
  * built-in as-of join; the naive formulation (`join` on key + range
  * predicate, then top-1 per left row) explodes to |left|x|right| pairs
  * per key before pruning.
  *
  * This implementation is the union-merge form: tag both sides, union,
  * and compute a running `last(payload, ignoreNulls)` over a single
  * (key, ts)-sorted window — ONE shuffle, no pair explosion, linear in
  * |left| + |right| per key. This is the plan that survives 100 TB; skew
  * is bounded by the hottest single key, same as any keyed shuffle.
  *
  * Tie semantics: a right row at exactly `leftTs` IS visible to the left
  * row (i.e. the match predicate is `rightTs <= leftTs`), matching
  * DuckDB/kdb as-of conventions — right rows sort before left rows at
  * equal timestamps.
  *
  * The right payload travels as a single struct so all payload columns
  * come from the SAME matched right row even when some are null.
  */
object AsOfJoin {

  private val TsCol = "__graft_asof_ts"
  private val TagCol = "__graft_asof_tag"
  private val PayloadCol = "__graft_asof_payload"

  /** @param left       rows to enrich (all columns preserved)
    * @param right      rows providing the payload
    * @param on         equality key column name (present on both sides)
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param payloadPrefix prefix for the attached right payload columns
    * @param forward    false (default): newest right row with
    *                   `rightTs <= leftTs`; true: earliest right row
    *                   with `rightTs >= leftTs` (look-ahead as-of)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      on: String,
      leftTs: String,
      rightTs: String,
      payloadPrefix: String = "right_",
      forward: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == on || c == rightTs).toSeq
    require(payloadCols.nonEmpty, "right side must carry at least one payload column")

    val l = left
      .withColumn(TsCol, col(leftTs))
      .withColumn(TagCol, lit(1))
    val r = right.select(
      col(on),
      col(rightTs).as(TsCol),
      lit(0).as(TagCol),
      struct(payloadCols.map(col): _*).as(PayloadCol))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // backward: time ascending, right rows first at equal ts (<= match);
    // forward: time descending, right rows first at equal ts (>= match) —
    // the running `last` then sees the nearest *later* right row.
    val w = Window
      .partitionBy(col(on))
      .orderBy(if (forward) col(TsCol).desc else col(TsCol).asc, col(TagCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned.withColumn(PayloadCol, last(col(PayloadCol), ignoreNulls = true).over(w))
    val attached = payloadCols.foldLeft(filled) { (d, c) =>
      d.withColumn(payloadPrefix + c, col(PayloadCol).getField(c))
    }
    attached.filter(col(TagCol) === 1).drop(TsCol, TagCol, PayloadCol)
  }
}
