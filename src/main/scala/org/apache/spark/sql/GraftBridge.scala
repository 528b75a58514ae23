package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions,
  * the sanctioned extension-point shim for libraries that ship native
  * Catalyst expressions (Spark 4 moved `Column` onto ColumnNode and
  * made the direct constructors package-private). This is the ONLY
  * file outside the `graft` package; everything it exposes is two
  * one-line delegations. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
