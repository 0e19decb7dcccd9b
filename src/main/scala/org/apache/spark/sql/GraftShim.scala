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

  /** Spark schema → parquet MessageType, exactly as Spark's own parquet
    * writer converts it — used to land schema-carrying EMPTY relations
    * driver-side (a full Spark job per zero-row write is pure overhead;
    * see graft.operators.StoreCommits.writeEmptyRelation).
    */
  def parquetMessageType(
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.parquet.schema.MessageType =
    new org.apache.spark.sql.execution.datasources.parquet
      .SparkToParquetSchemaConverter()
      .convert(schema)
}
