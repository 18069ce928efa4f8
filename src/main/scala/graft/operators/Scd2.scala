package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history (Kimball's SCD2) over a
  * CDC change log — the natural sibling of [[MergeEngine]]'s
  * latest-per-key merge (reference stream.py keeps ONLY the current
  * row per key; SCD2 keeps every version with its validity interval,
  * which is what an auditable warehouse and point-in-time training-set
  * reconstruction both need).
  *
  * Semantics: each change row opens an interval at its own version
  * (`valid_from`); the NEXT change to the same key — update or delete
  * alike — closes it (`valid_to`, exclusive); an open interval
  * (`valid_to IS NULL`) is the current row. A delete marker closes its
  * predecessor's interval but contributes no interval itself, so a
  * deleted key simply has no current row.
  *
  * Scale shape: ONE hash shuffle on the key columns and a linear
  * `lead` pass per key partition — the same cost as the latest-per-key
  * window it generalizes. No self-join (the textbook
  * `changes JOIN changes ON next-version` doubles the shuffle and
  * breaks under skew), no driver state. Point-in-time reads
  * ([[snapshotAsOf]]) are a stateless filter over the history — at
  * 100 TB, persist the history partitioned on a coarse bucket of the
  * key and both the filter and downstream key-joins stay pruned and
  * co-located.
  */
object Scd2 {

  /** Build the SCD2 history from a change log.
    *
    * @param changes     one row per observed version of an entity
    * @param keyCols     entity primary-key columns
    * @param versionCol  monotonically increasing, per-key-unique
    *                    version column (LSN, event id); ties are
    *                    undefined, as in the merge engine's guard
    * @param deletedWhen rows matching this predicate are tombstones:
    *                    they close the predecessor's interval and emit
    *                    no interval of their own
    * @return `changes`' columns + `valid_from`, `valid_to`
    *         (exclusive, null = open) and `is_current`
    */
  def history(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      deletedWhen: Option[Column] = None): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    val laid = changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
    deletedWhen match {
      case Some(pred) => laid.filter(!coalesce(pred, lit(false)))
      case None       => laid
    }
  }

  /** Current rows only — equivalent to the merge engine's
    * latest-per-key target, derived from the history instead of
    * recomputed from the log.
    */
  def currentSnapshot(history: DataFrame): DataFrame =
    history.filter(col("is_current")).drop("valid_from", "valid_to", "is_current")

  /** Point-in-time (time-travel) read: the rows in effect at
    * `version` — `valid_from <= version < valid_to`. Keys deleted at
    * or before `version` are absent by construction (their last
    * interval was closed by the tombstone's version).
    */
  def snapshotAsOf(history: DataFrame, version: Column): DataFrame =
    history
      .filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_from", "valid_to", "is_current")
}
