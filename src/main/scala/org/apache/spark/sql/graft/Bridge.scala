package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge. Spark 4 made `ExpressionUtils` private[sql]
 * (Columns are ColumnNode-backed for Connect); extension libraries bridge from
 * inside the org.apache.spark.sql namespace — the same approach Sedona/Delta
 * use for private[sql] access.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
