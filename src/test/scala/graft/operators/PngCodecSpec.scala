package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal.PngCodec

/** The PNG codec's container contract: every filter type round-trips
  * bit-exactly for every supported colour type, multi-chunk IDAT
  * streams reassemble, ancillary chunks skip, and every malformation
  * class fails LOUDLY — with the Spark seam degrading those to null
  * rows, never task failures. */
class PngCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random raster (no RNG: a fixed LCG walk)
  private def raster(n: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 1103515245 + 12345
      out(i) = ((s >>> 16) & 0xff).toByte
      i += 1
    }
    out
  }

  test("every filter type (None/Sub/Up/Average/Paeth) round-trips " +
      "bit-exactly for grey, RGB and RGBA") {
    for (channels <- Seq(1, 3, 4); filter <- 0 to 4) {
      val (w, h) = (13, 7)
      val px = raster(w * h * channels, seed = 41 * channels + filter)
      val img = PngCodec.decode(
        PngCodec.encode(px, w, h, channels, filter))
      assert(img.width == w && img.height == h &&
        img.channels == channels, s"dims ch=$channels f=$filter")
      assert(java.util.Arrays.equals(img.pixels, px),
        s"raster mismatch ch=$channels f=$filter")
    }
  }

  test("multi-chunk IDAT streams reassemble; ancillary chunks are " +
      "skipped; 1x1 and single-row edge shapes survive") {
    val px = raster(40 * 11, seed = 7)
    val split = PngCodec.encode(px, 40, 11, channels = 1, filter = 4,
      idatChunkBytes = 16)
    val whole = PngCodec.encode(px, 40, 11, channels = 1, filter = 4)
    assert(split.length > whole.length,
      "chunk split must add per-chunk overhead")
    assert(java.util.Arrays.equals(PngCodec.decode(split).pixels, px))
    // splice an ancillary tEXt chunk between IHDR and IDAT (signature
    // 8 + IHDR 25 bytes): decoder must skip it, CRC and all
    val text = "comment".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update("tEXt".getBytes("US-ASCII"))
    crc.update(text)
    val chunk = java.nio.ByteBuffer.allocate(12 + text.length)
      .putInt(text.length).put("tEXt".getBytes("US-ASCII")).put(text)
      .putInt(crc.getValue.toInt).array()
    val spliced = whole.take(33) ++ chunk ++ whole.drop(33)
    assert(java.util.Arrays.equals(PngCodec.decode(spliced).pixels, px))
    // degenerate shapes
    assert(PngCodec.decode(PngCodec.encode(Array[Byte](42), 1, 1))
      .pixels.toSeq == Seq(42.toByte))
    val row = raster(64, seed = 3)
    assert(java.util.Arrays.equals(
      PngCodec.decode(PngCodec.encode(row, 64, 1, 1, filter = 1))
        .pixels, row))
  }

  test("malformations fail loudly: bad signature, flipped byte (CRC), " +
      "truncated IDAT, interlace, 16-bit depth, palette colour type") {
    val px = raster(9 * 4, seed = 11)
    val good = PngCodec.encode(px, 9, 4)
    def expectFail(bytes: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        PngCodec.decode(bytes)
      }
      assert(e.getMessage.startsWith("PNG decode:"), s"$what: $e")
    }
    expectFail("not a png at all".getBytes("US-ASCII"), "signature")
    val flipped = good.clone()
    flipped(40) = (flipped(40) ^ 0x7f).toByte // inside IDAT data
    expectFail(flipped, "crc")
    expectFail(good.dropRight(20), "truncation")
    def mutIhdr(at: Int, v: Byte): Array[Byte] = {
      val b = good.clone()
      b(at) = v // 8=len .. IHDR data starts at 16: w(16) h(20) d(24)
      // fix the IHDR crc so the mutation is reached, not masked
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 17)
      val c = crc.getValue.toInt
      b(29) = (c >>> 24).toByte; b(30) = (c >>> 16).toByte
      b(31) = (c >>> 8).toByte; b(32) = c.toByte
      b
    }
    expectFail(mutIhdr(24, 16), "16-bit depth")    // depth byte
    expectFail(mutIhdr(25, 3), "palette")          // colour type
    expectFail(mutIhdr(28, 1), "interlace")        // interlace byte
  }

  test("the Spark seam: genuine corpus PNGs decode to the shared " +
      "raster facts; a corrupted payload degrades to a null row, " +
      "never a task failure") {
    val docs = Seq((1L, "hello png world"), (2L, ""),
      (3L, "x" * 200)).toDF("doc_id", "text")
    val media = Multimodal.withPngPayload(docs)
    val feats = Multimodal.extractPngFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width.contains(8 + 15 % 57))
    assert(feats(1L).channels.contains(1))
    // doc 3: 200 'x' bytes, w = 8 + 200 % 57 = 37, h = ceil(200/37) = 6
    assert(feats(3L).width.contains(37) && feats(3L).height.contains(6))
    val mean3 = (200L * 'x' + (37 * 6 - 200) * ' ').toDouble / (37 * 6)
    assert(math.abs(feats(3L).mean_level.get - mean3) < 1e-12)
    // corrupt one payload mid-IDAT: its row nulls out, others survive
    val corrupted = media.as[(Long, Array[Byte], String)]
      .map { case (id, p, t) =>
        if (id == 2L) p(p.length / 2) = (p(p.length / 2) ^ 0x55).toByte
        (id, p, t)
      }.toDF("media_id", "payload", "media_type")
    val after = Multimodal.extractPngFeatures(spark, corrupted)
      .collect().map(f => f.media_id -> f).toMap
    assert(after(2L).width.isEmpty && after(2L).raster_md5.isEmpty,
      "malformed payload must degrade to nulls")
    assert(after(2L).byte_len > 0)
    assert(after(1L).raster_md5 == feats(1L).raster_md5 &&
      after(3L).raster_md5 == feats(3L).raster_md5)
  }
}
