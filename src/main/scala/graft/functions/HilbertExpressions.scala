package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native codegen'd Hilbert curve index: maps a 2-D cell (x, y),
  * 0 ≤ x, y < 2^order, to its distance along the order-`order`
  * Hilbert curve — the standard iterative xy2d (the rotate-and-fold
  * formulation of Hilbert 1891; the loop is the public-domain
  * convention form used across the space-filling-curve literature).
  *
  * Why a second curve next to [[graft.operators.LayoutOps.zValue]]:
  * Morton interleaving has quadrant seams — consecutive z-values can
  * jump to the far side of the grid, so a file of contiguous
  * z-values may carry wide min/max on BOTH columns there. The
  * Hilbert walk moves one Manhattan-adjacent cell per step (the spec
  * asserts exactly that), so contiguous index ranges are tight
  * rectangles — strictly better stats-tightness for 2-D range
  * skipping at the same cost: one loop of shifts per row, no libm,
  * null in → null out.
  *
  * The expression is a pure function of (x, y, order) — deterministic
  * and foldable when inputs are literals; the DuckDB oracle replays
  * the identical 16 unrolled steps in integer SQL. */
case class HilbertIndex(left: Expression, right: Expression,
    order: Int) extends BinaryExpression {
  require(order >= 1 && order <= 31, s"bad hilbert order $order")

  private def integral(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects integral (x, y), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(xAny: Any, yAny: Any): Any = {
    var hx = xAny.asInstanceOf[Number].longValue()
    var hy = yAny.asInstanceOf[Number].longValue()
    val side = 1L << order
    require(hx >= 0 && hx < side && hy >= 0 && hy < side,
      s"hilbert_index($hx, $hy) outside [0, 2^$order)")
    var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((hx & s) > 0) 1L else 0L
      val ry = if ((hy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          hx = s - 1 - hx
          hy = s - 1 - hy
        }
        val t = hx; hx = hy; hy = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val side = 1L << order
      s"""
         |long $hx = (long) $xv;
         |long $hy = (long) $yv;
         |if ($hx < 0L || $hx >= ${side}L || $hy < 0L || $hy >= ${side}L) {
         |  throw new IllegalArgumentException(
         |    "hilbert_index(" + $hx + ", " + $hy + ") outside [0, 2^$order)");
         |}
         |long $d = 0L;
         |for (long $s = ${side >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($hx & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($hy & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $hx = $s - 1L - $hx;
         |      $hy = $s - 1L - $hy;
         |    }
         |    long $t = $hx; $hx = $hy; $hy = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
