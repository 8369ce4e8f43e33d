package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * conversion (`org.apache.spark.sql.classic.ExpressionUtils`), needed to
  * expose custom Catalyst expressions (e.g. [[graft.functions.VecDot]])
  * through the public Column API on Spark 4. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
