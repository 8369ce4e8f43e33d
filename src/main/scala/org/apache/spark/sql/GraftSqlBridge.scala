package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * conversion (`org.apache.spark.sql.classic.ExpressionUtils`), needed to
  * expose custom Catalyst expressions (e.g. [[graft.functions.VecDot]])
  * through the public Column API on Spark 4, plus the Dataset↔LogicalPlan
  * hops a custom logical operator (e.g. [[graft.plans.TopKPerKeyNode]])
  * needs to enter and leave the public DataFrame API. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The ANALYZED logical plan of a DataFrame — attribute references in
    * it are resolved, so expressions built from `df.col(...)` bind. */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
