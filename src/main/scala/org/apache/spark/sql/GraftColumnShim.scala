package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversion —
  * the standard extension-library pattern for exposing custom Catalyst
  * expressions as `Column`s (classic, non-Connect execution path).
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Fully-converted Catalyst tree (not the lazy `ColumnNodeExpression`
    * wrapper [[expression]] returns), so callers can pattern-match node
    * types — e.g. collect the leaf attribute names a column references.
    */
  def catalystTree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Stable session identifier (`sessionUUID` is `private[sql]`). */
  def sessionUUID(s: SparkSession): String = s match {
    case c: classic.SparkSession => c.sessionUUID
    case other => "id#" + System.identityHashCode(other)
  }

  /** Nullability-insensitive type equality (`equalsIgnoreNullability` is
    * `private[spark]`): the same logical schema round-trips with
    * different nullability depending on provenance (Seq-derived frames
    * are non-nullable, parquet reads nullable), so a literal comparison
    * of schema JSON false-positives.
    */
  def sameTypeIgnoreNullability(a: org.apache.spark.sql.types.DataType,
                                b: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.types.DataType.equalsIgnoreNullability(a, b)
}
