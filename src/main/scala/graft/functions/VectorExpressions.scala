package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding hot path: the dot
  * product of two numeric arrays, accumulated SEQUENTIALLY in double
  * (index order) — semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
  * but executing as a tight codegen'd loop over `ArrayData` instead of
  * per-element lambda interpretation. On a 100 TB embedding corpus this
  * is the difference between memory-bandwidth-bound and
  * interpreter-bound.
  *
  * Null semantics: null if either array is null; null elements count as
  * 0.0 (embeddings never contain nulls; tolerating them keeps the
  * expression total). Length mismatch: shorter length wins.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private val supported: Set[DataType] =
    Set(FloatType, DoubleType, IntegerType, LongType)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(et, _) => supported.contains(et)
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two arrays of float/double/int/long, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getD(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case _ => 0.0
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    val (lt, rt) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = if (aa.isNullAt(i)) 0.0 else getD(aa, i, lt)
      val y = if (bb.isNullAt(i)) 0.0 else getD(bb, i, rt)
      sum += x * y
      i += 1
    }
    sum
  }

  private def genGet(arr: String, i: String, t: DataType): String =
    s"($arr.isNullAt($i) ? 0.0 : (double)(${CodeGenerator.getValue(arr, t, i)}))"

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${genGet(a, i, lt)} * ${genGet(b, i, rt)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorFunctions {
  /** Column API for [[VecDot]]. */
  def vec_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))

  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))
}
