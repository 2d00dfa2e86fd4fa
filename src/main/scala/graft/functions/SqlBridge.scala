// A minimal visibility bridge: Column⇄Expression conversion lives behind
// private[sql] in Spark 4 (org.apache.spark.sql.classic.ExpressionUtils),
// so this one object sits inside Spark's package namespace to re-export
// exactly those two conversions for graft's custom expressions.
package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
