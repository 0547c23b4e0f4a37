package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge exposing Spark's package-private Column ⇄ Expression
  * conversion to the graft library — the standard technique for
  * third-party Catalyst extensions (custom expressions need to enter
  * the public Column API somewhere). Kept to exactly these two
  * one-liners. */
package object graftbridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
