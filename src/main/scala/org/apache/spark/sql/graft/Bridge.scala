package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 moved this conversion behind
  * `org.apache.spark.sql.classic.ExpressionUtils` (package-private to
  * org.apache.spark.sql), so custom Catalyst expressions need this shim —
  * the reference connector sits inside org.apache.spark.sql for the same
  * reason (SURVEY.md §7.1). Everything else in this project lives under
  * `graft.*`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
