package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression converters.
  *
  * Spark 4.x made `Column` a thin wrapper over `ColumnNode`;
  * `classic.ExpressionUtils` is the supported internal conversion point but is
  * `private[sql]`, so third-party native expressions need this one-file shim
  * living in the `org.apache.spark.sql` package namespace. No Spark internals
  * are re-implemented here — calls forward verbatim.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
