package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters, the
  * supported low-level seam for native Catalyst extensions in Spark 4
  * (Column no longer wraps an Expression directly).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly converts a Column's internal ColumnNode graph to a plain
    * Catalyst expression tree. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper whose children are OPAQUE to
    * `Expression.transform` — use this when the tree must be rewritten
    * (e.g. renaming attribute references) rather than just embedded.
    */
  def toCatalyst(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** `AbstractDataType` is `private[sql]`; expose it so expressions outside
    * this package can declare `inputTypes` for implicit input coercion.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Register a native expression under a SQL-callable name (the runtime
    * counterpart of `SparkSessionExtensions.injectFunction`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
