package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst `Expression`s and the public
  * `Column` API. Spark 4 made the Column <-> Expression converters
  * `private[sql]` (`classic.ExpressionUtils`); this shim re-exports the
  * two conversions — the standard technique for libraries that ship
  * native expressions without forking Spark.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
