package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x made Column<->Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This shim, living
  * under the `org.apache.spark.sql` package, re-exposes the two
  * conversions our custom Catalyst expressions need to surface as
  * `Column`s. No Spark internals are modified. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
