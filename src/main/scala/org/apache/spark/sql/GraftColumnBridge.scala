package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column<->Expression converters (the public
  * factory-in-spark-package pattern, cf. SNIPPETS.md [3]). Spark 4's Column
  * wraps a ColumnNode; these are the supported classic-mode conversions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
