package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column <-> catalyst Expression
  * converters, so graft can expose custom codegen'd Expressions as
  * ordinary Columns. This is the standard Spark-extension access idiom;
  * nothing here depends on implementation details beyond the stable
  * internal converter pair. */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
