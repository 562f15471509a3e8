package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge to the `private[sql]` Column↔Expression converters so the
 * graft engine can expose custom Catalyst expressions as ordinary Columns.
 * (The standard pattern for Spark extension libraries; nothing else from
 * Spark internals is accessed here.)
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
