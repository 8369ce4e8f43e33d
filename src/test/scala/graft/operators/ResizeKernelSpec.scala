package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The nearest-neighbor resize kernel's exactness contract: pure
  * integer source indexing (hand-checkable), the resizeDims dim rule
  * mirrored bit-for-bit, degenerate shapes clamped — so the resized
  * BYTES are oracle arithmetic. */
class ResizeKernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resizeNearest: hand-checked decimation, identity pass-through, " +
      "and the banner clamp") {
    // 4x4 -> 2x2: out(y,x) = in(y*4/2, x*4/2) = in(2y, 2x)
    val in = (0 until 16).map(_.toByte).toArray
    val out = Multimodal.resizeNearest(in, 4, 4, 2, 2)
    assert(out.toSeq == Seq[Byte](0, 2, 8, 10))
    // 3x1 -> 2x1: sx = 0*3/2=0, 1*3/2=1
    assert(Multimodal.resizeNearest(Array[Byte](7, 8, 9), 3, 1, 2, 1)
      .toSeq == Seq[Byte](7, 8))
    // upscale is the same rule mirrored: 2x1 -> 4x1 repeats each pixel
    assert(Multimodal.resizeNearest(Array[Byte](1, 2), 2, 1, 4, 1)
      .toSeq == Seq[Byte](1, 1, 2, 2))
  }

  test("resizeArea: hand-checked box averages, exact-partition " +
      "downscale preserves the mean, uniform images are invariant, " +
      "and upscale degrades to nearest") {
    // 4x4 -> 2x2: each output = floor(mean of its 2x2 box)
    val in = (0 until 16).map(_.toByte).toArray
    val out = Multimodal.resizeArea(in, 4, 4, 2, 2)
    // boxes: {0,1,4,5}=10/4=2, {2,3,6,7}=18/4=4, {8,9,12,13}=42/4=10,
    // {10,11,14,15}=50/4=12
    assert(out.toSeq == Seq[Byte](2, 4, 10, 12))
    // 3x1 -> 2x1: boxes [0,1) and [1,3): floor((8+9)/2)=8
    assert(Multimodal.resizeArea(Array[Byte](7, 8, 9), 3, 1, 2, 1)
      .toSeq == Seq[Byte](7, 8))
    // uniform stays uniform under ANY scale (no ringing, no drift)
    val flat = Array.fill(35 * 7)(77.toByte)
    assert(Multimodal.resizeArea(flat, 35, 7, 11, 3)
      .forall(_ == 77.toByte))
    // exact-partition downscale (6x1 -> 3x1): means are exact
    assert(Multimodal.resizeArea(
      Array[Byte](10, 20, 30, 40, 50, 60), 6, 1, 3, 1)
      .toSeq == Seq[Byte](15, 35, 55))
    // upscale: 1-px boxes == nearest
    assert(Multimodal.resizeArea(Array[Byte](1, 2), 2, 1, 4, 1).toSeq ==
      Multimodal.resizeNearest(Array[Byte](1, 2), 2, 1, 4, 1).toSeq)
    // anti-aliasing that nearest lacks: decimating an alternating
    // stripe pattern averages it instead of sampling one phase
    val stripes = Array.tabulate(16)(i => if (i % 2 == 0) 0.toByte
      else 100.toByte)
    assert(Multimodal.resizeArea(stripes, 16, 1, 8, 1)
      .forall(_ == 50.toByte))
    assert(Multimodal.resizeNearest(stripes, 16, 1, 8, 1)
      .forall(_ == 0.toByte))
  }

  test("resizeFeatures: the full decode→resize→digest pipeline matches " +
      "hand arithmetic, keeps small images untouched, and a 64-wide " +
      "banner stays a row (clamp)") {
    // doc 1: 10 bytes, w = 8 + 10 % 57 = 18 > 16 -> scaled by 16/18
    // doc 2: 5 bytes, w = 13, h = 1 -> within cap, untouched
    val docs = Seq((1L, "abcdefghij"), (2L, "hello"))
      .toDF("doc_id", "text")
    val f = Multimodal.resizeFeatures(spark,
        Multimodal.withPgmPayload(docs), maxDim = 16)
      .collect().map(r => r.media_id -> r).toMap
    assert(f(1L).width == 18 && f(1L).height == 1)
    val ow1 = math.floor(18.0 * (16.0 / 18.0)).toInt
    assert(f(1L).out_width == ow1 && f(1L).out_height == 1)
    // resized row: x*18/16 for x in 0..ow1-1 over "abcdefghij" + 8 pads
    val raster = ("abcdefghij" + " " * 8).getBytes("UTF-8")
    val expect = (0 until ow1).map(x => raster(x * 18 / 16)).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(f(1L).out_md5 ==
      md.digest(expect).map("%02x".format(_)).mkString)
    assert(math.abs(f(1L).mean_out -
      expect.map(_ & 0xff).sum.toDouble / expect.length) < 1e-12)
    // within-cap image: identity, digest of the raw raster
    assert(f(2L).out_width == 13 && f(2L).out_height == 1 &&
      f(2L).width == 13)
    // the clamp: 64 wide x 1 high scaled by 1/4 must stay >= 1 row
    val wide = Seq((3L, "x" * 56)).toDF("doc_id", "text") // w=64, h=1
    val g = Multimodal.resizeFeatures(spark,
        Multimodal.withPgmPayload(wide), maxDim = 16)
      .collect().head
    assert(g.width == 64 && g.out_width == 16 && g.out_height == 1,
      s"banner must clamp to a 16x1 row: $g")
  }
}
