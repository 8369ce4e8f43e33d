package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Runtime product-quantization codec shared by interpreted eval and
  * codegen — the fix for the unrolled-expression formulation of
  * [[graft.operators.Similarity.pqTopK]], whose m·ksub inline codeword
  * distances grew the generated Java past Janino's hard 64 KB method
  * limit: Spark then paid a FAILED megabyte compile per execution and
  * fell back to interpreted per-row expression trees. Here the codeword
  * loop runs at RUNTIME over a flat double[] codebook, so the generated
  * code is one static call — small, compiled once, and inside
  * whole-stage codegen whatever (m, ksub) is.
  *
  * Float-point parity with the expression form (and therefore with the
  * DuckDB oracle) is op-for-op:
  *   - the sub-vector self term ss_j = Σ_d (double)e[j·sub+d]² and each
  *     codeword dot Σ_d (double)e[j·sub+d]·cw_d accumulate sequentially
  *     in index order with floats widened per element — exactly
  *     [[VecDot]]'s fold (null elements contribute 0.0);
  *   - the distance is `(ss − 2.0·dot) + cc`, left-associated exactly
  *     like the Column expression `ss - lit(2.0) * dot + cc`;
  *   - argmin scans codes ascending with strict `<`, keeping the FIRST
  *     minimum — `least(struct(d, i))`'s lowest-code tie-break.
  *
  * Codebook layout (built driver-side from the deterministic first-ksub
  * policy): `cw[((j·ksub)+i)·sub + d]`, `cc[(j·ksub)+i]` = |c_{j,i}|².
  */
object PqCodec {

  private def elem(e: ArrayData, idx: Int): Double =
    if (e.isNullAt(idx)) 0.0 else e.getFloat(idx).toDouble

  /** d²(q_sub_j, c_{j,i}) for one (j, i): ss − 2·dot + cc. */
  private def dist(e: ArrayData, j: Int, i: Int, sub: Int, ksub: Int,
      cw: Array[Double], cc: Array[Double], ss: Double): Double = {
    val base = (j * ksub + i) * sub
    var dot = 0.0
    var d = 0
    while (d < sub) {
      dot += elem(e, j * sub + d) * cw(base + d)
      d += 1
    }
    ss - 2.0 * dot + cc(j * ksub + i)
  }

  private def selfDot(e: ArrayData, j: Int, sub: Int): Double = {
    var ss = 0.0
    var d = 0
    while (d < sub) {
      val x = elem(e, j * sub + d)
      ss += x * x
      d += 1
    }
    ss
  }

  /** Per-subspace argmin codes (m ints). */
  def encode(e: ArrayData, m: Int, sub: Int, ksub: Int,
      cw: Array[Double], cc: Array[Double]): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val ss = selfDot(e, j, sub)
      var best = 0
      var bestD = dist(e, j, 0, sub, ksub, cw, cc, ss)
      var i = 1
      while (i < ksub) {
        val di = dist(e, j, i, sub, ksub, cw, cc, ss)
        // Double.compare treats NaN as greatest, matching the SQL
        // least(struct(d, i)) ordering this argmin documents parity
        // with — a NaN distance at code 0 must lose to any real one
        if (java.lang.Double.compare(di, bestD) < 0) { best = i; bestD = di }
        i += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-subspace ADC lookup tables: m arrays of ksub distances. */
  def adcTables(e: ArrayData, m: Int, sub: Int, ksub: Int,
      cw: Array[Double], cc: Array[Double]): ArrayData = {
    val tables = new Array[Any](m)
    var j = 0
    while (j < m) {
      val ss = selfDot(e, j, sub)
      val row = new Array[Double](ksub)
      var i = 0
      while (i < ksub) {
        row(i) = dist(e, j, i, sub, ksub, cw, cc, ss)
        i += 1
      }
      tables(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(tables)
  }

  // ---- residual (IVFADC) variants -----------------------------------
  //
  // Jégou et al.'s IVFADC quantizes the RESIDUAL r = v − q1(v) of each
  // vector against its coarse cell centroid. The residual element
  // r_d = (double)e_d − cent_d is one extra IEEE subtraction applied
  // per element, in index order, before exactly the folds above — the
  // same op order a SQL engine computing `list_zip → x−y` residual
  // arrays then the sequential dot fold performs, so parity carries
  // over unchanged. `cent` is the flat centroid table
  // `cent[cellPos·(m·sub) + d]`; `cellPos` selects this row's coarse
  // cell (the dense centroid POSITION, not the centroid's vector id).

  private def relem(e: ArrayData, idx: Int, cent: Array[Double],
      base: Int): Double = elem(e, idx) - cent(base + idx)

  private def distRes(e: ArrayData, j: Int, i: Int, sub: Int, ksub: Int,
      cw: Array[Double], cc: Array[Double], ss: Double,
      cent: Array[Double], cbase: Int): Double = {
    val base = (j * ksub + i) * sub
    var dot = 0.0
    var d = 0
    while (d < sub) {
      dot += relem(e, j * sub + d, cent, cbase) * cw(base + d)
      d += 1
    }
    ss - 2.0 * dot + cc(j * ksub + i)
  }

  private def selfDotRes(e: ArrayData, j: Int, sub: Int,
      cent: Array[Double], cbase: Int): Double = {
    var ss = 0.0
    var d = 0
    while (d < sub) {
      val x = relem(e, j * sub + d, cent, cbase)
      ss += x * x
      d += 1
    }
    ss
  }

  /** Per-subspace argmin codes of the residual vs. cell `cellPos`. */
  def encodeRes(e: ArrayData, cellPos: Int, m: Int, sub: Int, ksub: Int,
      cw: Array[Double], cc: Array[Double],
      cent: Array[Double]): ArrayData = {
    val cbase = cellPos * m * sub
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val ss = selfDotRes(e, j, sub, cent, cbase)
      var best = 0
      var bestD = distRes(e, j, 0, sub, ksub, cw, cc, ss, cent, cbase)
      var i = 1
      while (i < ksub) {
        val di = distRes(e, j, i, sub, ksub, cw, cc, ss, cent, cbase)
        if (java.lang.Double.compare(di, bestD) < 0) { best = i; bestD = di }
        i += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Residual ADC lookup tables vs. cell `cellPos`. */
  def adcTablesRes(e: ArrayData, cellPos: Int, m: Int, sub: Int,
      ksub: Int, cw: Array[Double], cc: Array[Double],
      cent: Array[Double]): ArrayData = {
    val cbase = cellPos * m * sub
    val tables = new Array[Any](m)
    var j = 0
    while (j < m) {
      val ss = selfDotRes(e, j, sub, cent, cbase)
      val row = new Array[Double](ksub)
      var i = 0
      while (i < ksub) {
        row(i) = distRes(e, j, i, sub, ksub, cw, cc, ss, cent, cbase)
        i += 1
      }
      tables(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(tables)
  }
}

sealed trait PqExpression extends UnaryExpression {
  def m: Int
  def sub: Int
  def ksub: Int
  def cw: Seq[Double]
  def cc: Seq[Double]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.catalogString}")
  }

  protected def staticCall: String

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cwRef = ctx.addReferenceObj("pqCw", cw.toArray, "double[]")
    val ccRef = ctx.addReferenceObj("pqCc", cc.toArray, "double[]")
    defineCodeGen(ctx, ev, e =>
      s"graft.functions.PqCodec$$.MODULE$$.$staticCall(" +
        s"$e, $m, $sub, $ksub, $cwRef, $ccRef)")
  }
}

/** `pq_encode(embedding)` → array<int> of per-subspace codes. */
case class PqEncode(child: Expression, m: Int, sub: Int, ksub: Int,
    cw: Seq[Double], cc: Seq[Double]) extends PqExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def staticCall: String = "encode"
  override protected def nullSafeEval(input: Any): Any =
    PqCodec.encode(input.asInstanceOf[ArrayData], m, sub, ksub,
      cw.toArray, cc.toArray)
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `pq_adc_tables(embedding)` → array<array<double>> of per-subspace
  * ADC lookup rows. */
case class PqAdcTables(child: Expression, m: Int, sub: Int, ksub: Int,
    cw: Seq[Double], cc: Seq[Double]) extends PqExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_tables"
  override protected def staticCall: String = "adcTables"
  override protected def nullSafeEval(input: Any): Any =
    PqCodec.adcTables(input.asInstanceOf[ArrayData], m, sub, ksub,
      cw.toArray, cc.toArray)
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Residual (IVFADC) twins: a second child carries the row's coarse
  * cell POSITION, and `cent` the flat centroid table the residual is
  * taken against. Same codegen shape as [[PqExpression]] — one static
  * call into [[PqCodec]], inside whole-stage codegen at any (m, ksub,
  * nCells). */
sealed trait PqResExpression
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  def m: Int
  def sub: Int
  def ksub: Int
  def cw: Seq[Double]
  def cc: Seq[Double]
  def cent: Seq[Double]

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  protected def staticCall: String

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cwRef = ctx.addReferenceObj("pqCw", cw.toArray, "double[]")
    val ccRef = ctx.addReferenceObj("pqCc", cc.toArray, "double[]")
    val ctRef = ctx.addReferenceObj("pqCent", cent.toArray, "double[]")
    defineCodeGen(ctx, ev, (e, c) =>
      s"graft.functions.PqCodec$$.MODULE$$.$staticCall(" +
        s"$e, $c, $m, $sub, $ksub, $cwRef, $ccRef, $ctRef)")
  }
}

/** `pq_encode_res(embedding, cellPos)` → array<int> residual codes. */
case class PqEncodeRes(left: Expression, right: Expression, m: Int,
    sub: Int, ksub: Int, cw: Seq[Double], cc: Seq[Double],
    cent: Seq[Double]) extends PqResExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_res"
  override protected def staticCall: String = "encodeRes"
  override protected def nullSafeEval(emb: Any, cell: Any): Any =
    PqCodec.encodeRes(emb.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], m, sub, ksub, cw.toArray, cc.toArray,
      cent.toArray)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc_tables_res(embedding, cellPos)` → array<array<double>>
  * residual ADC lookup rows. */
case class PqAdcTablesRes(left: Expression, right: Expression, m: Int,
    sub: Int, ksub: Int, cw: Seq[Double], cc: Seq[Double],
    cent: Seq[Double]) extends PqResExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_tables_res"
  override protected def staticCall: String = "adcTablesRes"
  override protected def nullSafeEval(emb: Any, cell: Any): Any =
    PqCodec.adcTablesRes(emb.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], m, sub, ksub, cw.toArray, cc.toArray,
      cent.toArray)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pq_encode(emb: Column, m: Int, sub: Int, ksub: Int,
      cw: Seq[Double], cc: Seq[Double]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(emb),
      m, sub, ksub, cw, cc))

  def pq_adc_tables(emb: Column, m: Int, sub: Int, ksub: Int,
      cw: Seq[Double], cc: Seq[Double]): Column =
    GraftSqlBridge.column(PqAdcTables(GraftSqlBridge.expression(emb),
      m, sub, ksub, cw, cc))

  def pq_encode_res(emb: Column, cellPos: Column, m: Int, sub: Int,
      ksub: Int, cw: Seq[Double], cc: Seq[Double],
      cent: Seq[Double]): Column =
    GraftSqlBridge.column(PqEncodeRes(GraftSqlBridge.expression(emb),
      GraftSqlBridge.expression(cellPos), m, sub, ksub, cw, cc, cent))

  def pq_adc_tables_res(emb: Column, cellPos: Column, m: Int, sub: Int,
      ksub: Int, cw: Seq[Double], cc: Seq[Double],
      cent: Seq[Double]): Column =
    GraftSqlBridge.column(PqAdcTablesRes(GraftSqlBridge.expression(emb),
      GraftSqlBridge.expression(cellPos), m, sub, ksub, cw, cc, cent))
}
