package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Parity contract of the native PQ codec ([[PqCodec]]) against the
  * unrolled Column-expression formulation it replaced: bit-identical
  * codes and ADC distances on randomized vectors. The codec exists
  * because the unrolled form blew Janino's 64 KB method limit at
  * production (m, ksub); at the small (m, ksub) used HERE the unrolled
  * form still compiles, which is exactly what makes it usable as the
  * reference implementation. */
class PqCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 16
  private val m = 4
  private val sub = dims / m
  private val ksub = 8

  // deterministic pseudo-random corpus: LCG-derived floats in [-1, 1]
  private def vec(seed: Long): Seq[Float] = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    (0 until dims).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33).toDouble / (1L << 31).toDouble - 1.0).toFloat
    }
  }

  private lazy val corpus = (0L until 64L).map(i => (i, vec(i)))
    .toDF("vec_id", "embedding")

  // codebook per the deterministic first-ksub policy, exactly as
  // Similarity.pqTopK builds it
  private lazy val cents: Array[Seq[Float]] = (0L until ksub.toLong)
    .map(vec).toArray
  private def cw(j: Int, i: Int): Seq[Double] =
    cents(i).slice(j * sub, (j + 1) * sub).map(_.toDouble)
  private def cc(j: Int, i: Int): Double =
    cw(j, i).foldLeft(0.0)((acc, x) => acc + x * x)
  private lazy val cwFlat: Seq[Double] = for {
    j <- 0 until m; i <- 0 until ksub; x <- cw(j, i)
  } yield x
  private lazy val ccFlat: Seq[Double] = for {
    j <- 0 until m; i <- 0 until ksub
  } yield cc(j, i)

  // the replaced unrolled formulation, verbatim
  private def subVec(j: Int): Column =
    slice(col("embedding"), j * sub + 1, sub)
  private def exprDist(j: Int, i: Int): Column =
    graft.functions.VectorFunctions.vec_dot(subVec(j), subVec(j)) -
      lit(2.0) * graft.functions.VectorFunctions.vec_dot(subVec(j),
        typedLit(cw(j, i))) + lit(cc(j, i))
  private def exprEncode(j: Int): Column = least((0 until ksub).map { i =>
    struct(exprDist(j, i).as("d"), lit(i).as("i"))
  }: _*).getField("i")

  test("pq_encode matches the unrolled least(struct) argmin bit-for-bit") {
    val got = corpus.select(col("vec_id"),
        PqFunctions.pq_encode(col("embedding"), m, sub, ksub,
          cwFlat, ccFlat).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val want = corpus.select(col("vec_id"),
        array((0 until m).map(exprEncode): _*).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got === want)
  }

  test("pq_adc_tables matches the unrolled distance arrays bit-for-bit") {
    val got = corpus.select(col("vec_id"),
        PqFunctions.pq_adc_tables(col("embedding"), m, sub, ksub,
          cwFlat, ccFlat).as("qds"))
      .as[(Long, Seq[Seq[Double]])].collect().toMap
    val want = corpus.select(col("vec_id"),
        array((0 until m).map(j =>
          array((0 until ksub).map(i => exprDist(j, i)): _*)): _*)
          .as("qds"))
      .as[(Long, Seq[Seq[Double]])].collect().toMap
    // exact bit equality, not tolerance: the codec's claim is op-for-op
    for ((id, rows) <- want; (row, j) <- rows.zipWithIndex;
         (d, i) <- row.zipWithIndex)
      assert(java.lang.Double.doubleToRawLongBits(got(id)(j)(i)) ===
        java.lang.Double.doubleToRawLongBits(d),
        s"vec $id subspace $j code $i: ${got(id)(j)(i)} != $d")
  }

  test("argmin tie-break keeps the lowest code index") {
    // duplicate codewords force exact distance ties: code 0 must win
    val dupCw: Seq[Double] = for {
      j <- 0 until m; _ <- 0 until ksub; x <- cw(j, 0)
    } yield x
    val dupCc: Seq[Double] = for {
      j <- 0 until m; _ <- 0 until ksub
    } yield cc(j, 0)
    val got = corpus.limit(8).select(
        PqFunctions.pq_encode(col("embedding"), m, sub, ksub,
          dupCw, dupCc).as("codes"))
      .as[Seq[Int]].collect()
    assert(got.forall(_.forall(_ == 0)))
  }

  test("a NaN distance loses the argmin, matching least(struct) ordering") {
    // poison code 0's codeword with NaN in every subspace: its distance
    // is NaN for every vector, and the SQL least(struct(d, i)) ordering
    // (NaN = greatest) must pick the smallest non-NaN code instead —
    // the primitive `di < bestD` form this spec used to allow would
    // keep code 0 whenever its NaN came first
    def cwN(j: Int, i: Int): Seq[Double] =
      if (i == 0) Seq.fill(sub)(Double.NaN) else cw(j, i)
    def ccN(i: Int, j: Int): Double =
      if (i == 0) Double.NaN else cc(j, i)
    val cwFlatN: Seq[Double] = for {
      j <- 0 until m; i <- 0 until ksub; x <- cwN(j, i)
    } yield x
    val ccFlatN: Seq[Double] = for {
      j <- 0 until m; i <- 0 until ksub
    } yield ccN(i, j)
    def exprDistN(j: Int, i: Int): Column =
      graft.functions.VectorFunctions.vec_dot(subVec(j), subVec(j)) -
        lit(2.0) * graft.functions.VectorFunctions.vec_dot(subVec(j),
          typedLit(cwN(j, i))) + lit(ccN(i, j))
    def exprEncodeN(j: Int): Column = least((0 until ksub).map { i =>
      struct(exprDistN(j, i).as("d"), lit(i).as("i"))
    }: _*).getField("i")
    val got = corpus.select(col("vec_id"),
        PqFunctions.pq_encode(col("embedding"), m, sub, ksub,
          cwFlatN, ccFlatN).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val want = corpus.select(col("vec_id"),
        array((0 until m).map(exprEncodeN): _*).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got === want)
    assert(got.values.forall(_.forall(_ != 0)),
      "the NaN codeword must never win the argmin")
  }

  test("residual codec: encode equals raw codec when the centroid is " +
      "the zero vector, and interpreted eval agrees with the DF path") {
    // with a zero centroid the residual IS the vector, so encodeRes
    // must reproduce encode bit-for-bit — pinning the residual
    // subtraction as the ONLY difference between the twins
    val zeroCent: Seq[Double] = Seq.fill(dims)(0.0)
    val viaRes = corpus.select(col("vec_id"),
        PqFunctions.pq_encode_res(col("embedding"), lit(0), m, sub,
          ksub, cwFlat, ccFlat, zeroCent).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val viaRaw = corpus.select(col("vec_id"),
        PqFunctions.pq_encode(col("embedding"), m, sub, ksub,
          cwFlat, ccFlat).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(viaRes === viaRaw)
    // interpreted path of the binary expression
    val expr = PqEncodeRes(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = false),
      org.apache.spark.sql.catalyst.expressions.Literal(0),
      m, sub, ksub, cwFlat, ccFlat, zeroCent)
    val emb = vec(7L)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        emb.toArray))
    val interpreted = expr.eval(row)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    assert(interpreted === viaRaw(7L))
  }

  test("interpreted eval agrees with codegen (expression encoder path)") {
    // force the interpreted path via a plain eval on InternalRow
    val expr = PqEncode(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = false),
      m, sub, ksub, cwFlat, ccFlat)
    val emb = vec(7L)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        emb.toArray))
    val interpreted = expr.eval(row)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    val viaDf = corpus.where(col("vec_id") === 7L)
      .select(PqFunctions.pq_encode(col("embedding"), m, sub, ksub,
        cwFlat, ccFlat))
      .as[Seq[Int]].head()
    assert(interpreted === viaDf)
  }
}
