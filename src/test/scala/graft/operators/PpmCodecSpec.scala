package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** P6 (PPM, RGB) codec: round-trip, header grammar, per-channel
  * feature extraction, and the null-not-fail malformed policy. */
class PpmCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PPM codec: encode/decode round-trips, honors comments, and " +
      "rejects malformed input") {
    import Multimodal.{PpmCodec, PpmImage}
    val img = PpmCodec.decode(PpmCodec.encode(
      Array[Byte](1, 2, 3, 4, 5, 6), width = 2, height = 1))
    assert(img == PpmImage(2, 1, 255, img.pixels) &&
      img.pixels.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // short raster is space-padded to 3*w*h by the encoder
    val padded = PpmCodec.decode(PpmCodec.encode(
      Array[Byte](9), width = 1, height = 2))
    assert(padded.pixels.toSeq == Seq[Byte](9, 32, 32, 32, 32, 32))
    // Netpbm '#' comments inside the header
    val withComment = ("P6\n# rgb\n1 1\n255\n").getBytes("US-ASCII") ++
      Array[Byte](7, 8, 9)
    val ci = PpmCodec.decode(withComment)
    assert(ci.width == 1 && ci.pixels.toSeq == Seq[Byte](7, 8, 9))
    intercept[IllegalArgumentException] { // P5 magic is not P6
      PpmCodec.decode("P5\n1 1\n255\n".getBytes("US-ASCII") ++
        Array[Byte](1))
    }
    intercept[IllegalArgumentException] { // truncated raster (< 3wh)
      PpmCodec.decode("P6\n2 1\n255\n".getBytes("US-ASCII") ++
        Array[Byte](1, 2, 3, 4, 5))
    }
  }

  test("extractRgbFeatures: per-channel means over the interleaved " +
      "raster; malformed payload -> null columns, not task failure") {
    import Multimodal.PpmCodec
    // 2x1 RGB: pixels (10,20,30) and (50,60,70) -> means 30/40/50
    val good = PpmCodec.encode(
      Array[Byte](10, 20, 30, 50, 60, 70), width = 2, height = 1)
    val bad = "definitely not an image".getBytes("US-ASCII")
    val media = Seq((1L, good), (2L, bad)).toDF("media_id", "payload")
    val rows = Multimodal.extractRgbFeatures(spark, media)
      .collect().sortBy(_.media_id)
    val g = rows(0)
    assert(g.width.contains(2) && g.height.contains(1) &&
      g.maxval.contains(255))
    assert(g.mean_r.contains(30.0) && g.mean_g.contains(40.0) &&
      g.mean_b.contains(50.0))
    val b = rows(1)
    assert(b.width.isEmpty && b.mean_r.isEmpty && b.mean_b.isEmpty,
      "malformed decodes to nulls")
    assert(b.byte_len == bad.length && b.feature_hash.length == 32,
      "metadata still populated for malformed payloads")
  }

  test("withPpmPayload payloads decode back to the documents' bytes " +
      "(plus space padding), dims follow the width rule") {
    val docs = Seq((7L, "x" * 100)).toDF("doc_id", "text")
    val feats = Multimodal.extractRgbFeatures(spark,
      Multimodal.withPpmPayload(docs)).collect()
    // n=100 -> w = 4 + 100 % 23 = 12, h = ceil(100/36) = 3
    assert(feats.length == 1)
    val f = feats.head
    assert(f.width.contains(12) && f.height.contains(3))
    assert(f.byte_len == "P6\n12 3\n255\n".length + 3 * 12 * 3)
    // raster = 100 'x' (120) + 8 ' ' (32): channel sums differ by pad
    // positions but all three means sit between 32 and 120
    Seq(f.mean_r, f.mean_g, f.mean_b).foreach(m =>
      assert(m.exists(v => v > 32.0 && v < 120.0)))
  }
}
