package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CountInSet

/** Optimizer rule: rewrite the natural-but-interpreted HOF idiom
  *
  *   `size(filter(arr, x -> x IN ('a', 'b', ...)))`
  *
  * into the native codegen'd [[graft.functions.CountInSet]]. Spark's
  * higher-order functions are `CodegenFallback` — every element of
  * every row pays lambda interpretation — while CountInSet is one hash
  * probe per element inside whole-stage codegen. The rewrite makes the
  * fast path TRANSPARENT: users (and SQL) write the idiomatic form and
  * the engine substitutes the native expression, which is exactly what
  * `SparkSessionExtensions.injectOptimizerRule` is for.
  *
  * Safety conditions (all required):
  *  - the lambda body is `v IN (<foldable string literals>)` or the
  *    optimized `InSet` form, with `v` the lambda's own variable;
  *  - `legacySizeOfNull` is off, so `size(null)` is null on both paths
  *    (CountInSet is null-in → null-out);
  *  - a null element never matches on either path (`null IN (...)` is
  *    null → filtered; CountInSet skips nulls), so counts agree.
  * Result type is preserved by casting the native long back to int.
  */
object CountInSetRewrite extends Rule[LogicalPlan] {

  private def asWords(exprs: Seq[Expression]): Option[Seq[String]] =
    if (exprs.nonEmpty && exprs.forall(e =>
        e.foldable && e.dataType.isInstanceOf[StringType]))
      Some(exprs.map(_.eval(null)).collect {
        case s: UTF8String => s.toString
      })
    else None

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ArrayFilter(arg,
          LambdaFunction(body, Seq(v: NamedLambdaVariable), _)), false) =>
        body match {
          case In(lv: NamedLambdaVariable, list)
              if lv.exprId == v.exprId =>
            asWords(list).fold(s: Expression)(words =>
              Cast(CountInSet(arg, words), IntegerType))
          case InSet(lv: NamedLambdaVariable, hset)
              if lv.exprId == v.exprId &&
                hset.forall(_.isInstanceOf[UTF8String]) =>
            Cast(CountInSet(arg,
              hset.toSeq.map(_.asInstanceOf[UTF8String].toString)),
              IntegerType)
          case _ => s
        }
    }
}
