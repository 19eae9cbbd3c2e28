package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the package-private Column <-> Expression
  * converters (Spark 4 made Column node-backed; these are the supported
  * internal accessors). Same placement pattern as other libraries that
  * register custom expressions (see SNIPPETS.md [2], [3]). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
