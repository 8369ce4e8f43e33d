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

/** Native codegen'd distinct w-gram counter over a token array:
  * the number of DISTINCT space-joined w-token windows, with the
  * shorter-than-w fallback counting the whole document as one gram —
  * exactly `len(list_distinct(<w-gram transform>))` but one tight loop
  * with a per-row hash set instead of materializing an array of
  * concatenated gram strings through interpreted lambda steps (`
  * transform` + `concat_ws` + `array_distinct` are all
  * `CodegenFallback`). Tokens cannot contain the join character
  * (they're produced by splitting on whitespace), so distinct joined
  * strings ≡ distinct token windows. Feeds repetition-ratio scoring,
  * which at 100 TB runs per document at scan speed. */
case class DistinctWGramCount(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, "w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"distinct_wgram_count expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "distinct_wgram_count"

  /** Shared by eval and codegen: one pass, one HashSet, no gram array. */
  def countDistinct(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    if (n < w) return 1L
    val seen = new java.util.HashSet[UTF8String]((n - w + 1) * 2)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i <= n - w) {
      val parts = new Array[UTF8String](w)
      var j = 0
      while (j < w) {
        parts(j) =
          if (arr.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    seen.size.toLong
  }

  override protected def nullSafeEval(input: Any): Any =
    countDistinct(input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dwgc", this, classOf[DistinctWGramCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.countDistinct($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native codegen'd hex-digit → bit-sign expansion for SimHash: given a
  * hex digest string, emit `bits` values of ±1 where value j is
  * `(((hexdigit(s[j/4]) >> (3 - j%4)) & 1) * 2 - 1)` — the per-bit
  * contribution of one shingle to a SimHash signature. Semantically
  * identical to the 32-expression `substring`+`conv`+`shiftright`
  * chain it replaces, but ONE pass over 8 hex chars per row instead of
  * 32 separate substring/base-conversion evaluations. The engine-
  * agnostic definition (plain hex-digit arithmetic) is what keeps the
  * DuckDB oracle replica valid. Null in → null out; non-hex chars
  * contribute as digit 0 (can't occur on md5 input). */
case class HexBitSigns(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 128, "bits must be in [1, 128]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hex_bit_signs expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hex_bit_signs"

  /** Shared by eval and codegen. */
  def signsOf(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val out = new Array[Int](bits)
    var j = 0
    while (j < bits) {
      val pos = j / 4
      val c = if (pos < str.length) str.charAt(pos) else '0'
      val digit =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else 0
      out(j) = ((digit >> (3 - (j % 4))) & 1) * 2 - 1
      j += 1
    }
    // UnsafeArrayData: primitive-backed, no per-element boxing
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    signsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hbs", this, classOf[HexBitSigns].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.signsOf($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object HashFunctions {
  /** Column API for [[RollingHash]]. */
  def rolling_hash(s: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(s)))

  /** Column API for [[HexBitSigns]]. */
  def hex_bit_signs(s: Column, bits: Int): Column =
    GraftSqlBridge.column(HexBitSigns(GraftSqlBridge.expression(s), bits))

  /** Column API for [[DistinctWGramCount]]. */
  def distinct_wgram_count(toks: Column, w: Int): Column =
    GraftSqlBridge.column(
      DistinctWGramCount(GraftSqlBridge.expression(toks), w))
}
