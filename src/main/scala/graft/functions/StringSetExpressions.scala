package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd "how many array elements are in this static word
  * set" — semantically identical to
  * `size(filter(arr, t -> t.isInCollection(words)))` but a tight loop
  * with one hash probe per element instead of an interpreted lambda:
  * Spark's higher-order functions are `CodegenFallback`, so the
  * filter+size form boxes every token of every document. Quality
  * scoring probes 1 set and language-ID probes one per language — on a
  * 100 TB corpus that interpreter tax dominates the scan. Duplicates
  * count (occurrences, not membership); null elements don't match.
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_in_set expects array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var i = 0
    var n = 0L
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1L
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $n = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) {
         |    $n++;
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object StringSetFunctions {
  /** Column API for [[CountInSet]]. */
  def count_in_set(arr: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(CountInSet(GraftSqlBridge.expression(arr), words))
}
