package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression↔Column converters — the
  * standard extension-library pattern for plugging custom Catalyst
  * expressions (graft.functions.VecDot / VecSqDist) into the public
  * Column algebra on Spark 4's classic session.
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
