package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built Bloom filter — the fact
  * side of a bloom-prefiltered join. The serialized filter rides in the
  * expression itself (it is part of the plan, so every task gets it
  * with the closure — a few MB for hundreds of millions of keys at 3%
  * fpp), is deserialized ONCE per task, and each row costs a handful
  * of hash probes inside whole-stage codegen. No false negatives, so a
  * `where(might_contain_long(...))` prefilter never changes the result
  * of the exact join that follows it — it only shrinks what reaches
  * the shuffle.
  *
  * Null in → null out (mirrors `IN` semantics under a filter: null
  * never passes). Integral widths narrower than long are widened by
  * the caller (`mightContainLong` hashes the long value).
  */
case class MightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"might_contain_long expects an integral column, got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_long"

  @transient lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  def probe(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long => probe(l)
    case i: java.lang.Integer => probe(i.longValue)
    case s: java.lang.Short => probe(s.longValue)
    case b: java.lang.Byte => probe(b.longValue)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mcl", this,
      classOf[MightContainLong].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.probe((long) $a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BloomFunctions {
  /** Column API for [[MightContainLong]]. */
  def might_contain_long(value: Column, bloomBytes: Array[Byte]): Column =
    GraftSqlBridge.column(
      MightContainLong(GraftSqlBridge.expression(value), bloomBytes))
}
