package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters of
  * Spark 4's classic API (columnNodeSupport.scala) — the supported
  * way to wrap a custom Catalyst Expression as a user-facing Column
  * when living outside the org.apache.spark.sql package is not an
  * option. Scoped to exactly the two calls we need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
