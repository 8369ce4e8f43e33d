package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial rolling hash over a string:
  * `h = fold(code_units, 0, (a, c) -> (a * 31 + c) mod (2^31 - 1))`.
  *
  * Semantically identical to
  * `aggregate(split(s, ''), 0L, (acc, ch) -> (acc*31 + ascii(ch)) % 2147483647)`
  * — the fold runs over UTF-16 code units in order, exactly what the
  * per-character split + `ascii` composition sees — but as ONE tight
  * loop per row instead of materializing an array of one-character
  * strings and interpreting two lambda steps per character
  * (higher-order functions are `CodegenFallback`). Fingerprinting a
  * 100 TB corpus per-character through an interpreter is the kind of
  * hot-loop tax this engine exists to avoid.
  *
  * Overflow-safe in long arithmetic: acc < 2^31, so acc*31 + c < 2^36.
  * Null in → null out. Empty string → 0 (the split form folds a single
  * empty token whose `ascii` is 0, landing on the same value).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i).toLong) % 2147483647L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $a.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31L + (long) $s.charAt($i)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object HashFunctions {
  /** Column API for [[RollingHash]]. */
  def rolling_hash(s: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(s)))
}
