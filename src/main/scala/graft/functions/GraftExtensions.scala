package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the engine's custom Catalyst expressions, two ways:
  *
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` installer for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *    cluster-wide path.
  *  - [[GraftFunctions.register]]: imperative registration on a live
  *    session — the embedded/test path.
  *
  * Either way `SELECT vec_dot(a, b)` works from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.vecDotDescriptor)
  }
}

object GraftFunctions {
  private[functions] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
}
