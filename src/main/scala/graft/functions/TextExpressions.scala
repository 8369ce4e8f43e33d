package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word w-shingles of a document: lowercase, trim,
  * whitespace-split, then every w-token window joined by a single
  * space, distinct in first-occurrence order — semantically identical
  * to the compositional form
  *
  * {{{
  *   toks = split(trim(lower(text)), "\\s+")
  *   if (size(toks) < w) array(concat_ws(" ", toks))
  *   else array_distinct(transform(sequence(0, size(toks) - w),
  *     i => concat_ws(" ", slice(toks, i + 1, w))))
  * }}}
  *
  * but ONE pass per row. The compositional form pays the interpreter
  * five times per window: `transform`, `slice`, `concat_ws`, plus
  * `sequence` materialization and a final `array_distinct` — all
  * higher-order/collection expressions outside whole-stage codegen,
  * each allocating an intermediate array per element. Shingling is the
  * front door of the entire dedup family (MinHash/LSH, n-gram Jaccard,
  * SimHash, contamination); at 100 TB it runs per document at scan
  * speed, so it must be a tight loop, not an interpreted lambda chain.
  *
  * Exact-parity notes (each step delegates to the SAME kernel the
  * built-in uses): lowercase is `UTF8String.toLowerCase` (= `lower`),
  * trim is `UTF8String.trim` (= `trim`, ASCII space only), the split is
  * Java regex `\s+` with limit -1 (= 2-arg `split`, so a leading
  * non-space-whitespace edge still yields the leading empty token), and
  * the short-document fallback joins ALL tokens (= `concat_ws` over the
  * whole array). Null in → null out; empty string → [""] (one empty
  * shingle), matching the fallback branch.
  */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  /** Shared by eval and codegen: one pass, one LinkedHashSet (distinct
    * preserving first occurrence), no intermediate gram arrays. */
  def shinglesOf(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.trim().toString
    val toks = WordShingles.Whitespace.split(s, -1)
    if (toks.length < w) {
      val joined = if (toks.length == 1) toks(0) else toks.mkString(" ")
      return new GenericArrayData(Array[Any](UTF8String.fromString(joined)))
    }
    val n = toks.length - w + 1
    val seen = new java.util.LinkedHashSet[String](n * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    shinglesOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ws", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.shinglesOf($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WordShingles {
  /** Compiled once; `\s+` over UTF-16 chars — the same pattern semantics
    * `split(col, "\\s+")` compiles per-partition. */
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
}

object TextFunctions {
  /** Column API for [[WordShingles]]. */
  def word_shingles(text: Column, w: Int): Column =
    GraftSqlBridge.column(
      WordShingles(GraftSqlBridge.expression(text), w))
}
