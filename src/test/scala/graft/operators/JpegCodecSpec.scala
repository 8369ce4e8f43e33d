package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal.JpegCodec

/** The baseline JPEG codec's contract: lossy-but-bounded roundtrips
  * (tight under the unit quantizer, DC-bounded means under the
  * standard one), exact container facts, bit-stable determinism,
  * loud refusal of every unsupported profile, and the null-not-fail
  * Spark seam. */
class JpegCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def raster(n: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 1103515245 + 12345
      out(i) = (32 + ((s >>> 16) & 0x3f)).toByte // mid-range, text-like
      i += 1
    }
    out
  }

  private def maxErr(a: Array[Byte], b: Array[Byte]): Int =
    a.zip(b).map { case (x, y) =>
      math.abs((x & 0xff) - (y & 0xff)) }.max

  test("roundtrip bounds: a uniform image survives the standard " +
      "quantizer within rounding; noise survives the unit quantizer " +
      "within DCT rounding; dims crop exactly off block padding") {
    val flat = Array.fill[Byte](20 * 13)(97)
    val dFlat = JpegCodec.decode(JpegCodec.encode(flat, 20, 13))
    assert(dFlat.width == 20 && dFlat.height == 13 &&
      dFlat.channels == 1)
    assert(maxErr(dFlat.pixels, flat) <= 1,
      "a constant block is pure DC — only rounding may move it")

    val noisy = raster(18 * 7, seed = 5)
    val dNoise = JpegCodec.decode(
      JpegCodec.encode(noisy, 18, 7, quant = JpegCodec.unitQuant))
    assert(dNoise.width == 18 && dNoise.height == 7)
    assert(maxErr(dNoise.pixels, noisy) <= 2,
      "unit quantization isolates DCT/IDCT rounding")

    // standard quantizer on noise: lossy, but the mean of every FULL
    // block rides the DC coefficient alone
    val w = 24; val h = 16
    val img = raster(w * h, seed = 9)
    val dec = JpegCodec.decode(JpegCodec.encode(img, w, h))
    def mean(a: Array[Byte]) =
      a.map(_ & 0xff).sum.toDouble / a.length
    assert(math.abs(mean(dec.pixels) - mean(img)) <= 2.0,
      s"DC quantization bounds the mean: ${mean(dec.pixels)} vs " +
        s"${mean(img)}")
    // determinism: encode and decode are bit-stable across runs
    assert(java.util.Arrays.equals(
      JpegCodec.encode(img, w, h), JpegCodec.encode(img, w, h)))
    assert(java.util.Arrays.equals(dec.pixels,
      JpegCodec.decode(JpegCodec.encode(img, w, h)).pixels))
  }

  test("RGB 4:4:4 roundtrip through the JFIF color transform stays " +
      "within the transform+DCT rounding budget under unit quant") {
    val px = raster(11 * 9 * 3, seed = 21)
    val dec = JpegCodec.decode(
      JpegCodec.encode(px, 11, 9, channels = 3,
        quant = JpegCodec.unitQuant))
    assert(dec.width == 11 && dec.height == 9 && dec.channels == 3)
    assert(maxErr(dec.pixels, px) <= 4,
      "YCbCr is a rounded change of basis — small, bounded loss")
  }

  test("unsupported profiles and malformations refuse loudly") {
    val good = JpegCodec.encode(raster(16 * 8, 3), 16, 8)
    def expectFail(bytes: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        JpegCodec.decode(bytes)
      }
      assert(e.getMessage.startsWith("JPEG decode:"), s"$what: $e")
    }
    expectFail("not a jpeg".getBytes("US-ASCII"), "SOI")
    expectFail(good.dropRight(12), "truncated scan")
    // SOF0 relabeled SOF2 is a MALFORMED progressive stream (its
    // single scan claims the full band, illegal in progressive):
    // still refuses loudly, never guesses
    val sofAt = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0))
        i += 1
      i
    }
    val prog = good.clone(); prog(sofAt + 1) = 0xc2.toByte
    expectFail(prog, "progressive")
    // 4:2:2 (2x1 luma) is NOT in the supported profile: refuse
    val color = JpegCodec.encode(raster(16 * 8 * 3, 3), 16, 8,
      channels = 3)
    val sofC = {
      var i = 2
      while (!((color(i) & 0xff) == 0xff && (color(i + 1) & 0xff) == 0xc0))
        i += 1
      i
    }
    val sub422 = color.clone()
    sub422(sofC + 2 + 7 + 1 + 1) = 0x21.toByte // luma sampling 2x1
    expectFail(sub422, "4:2:2")
    // a single-component scan is non-interleaved per T.81: a wild
    // grayscale file declaring 2x2 factors must decode IDENTICALLY
    // to its 1x1 twin, not refuse
    val gray22 = good.clone()
    gray22(sofAt + 2 + 7 + 1 + 1) = 0x22.toByte
    assert(JpegCodec.decode(gray22).pixels.toSeq ==
      JpegCodec.decode(good).pixels.toSeq)
  }

  test("4:2:0 roundtrip: subsampled chroma survives within bounded " +
      "error, luma is untouched by the subsampling, and the wire " +
      "really carries quarter-size chroma") {
    // a smooth color gradient (subsampling-friendly content)
    val (w, h) = (32, 16)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      px(3 * (y * w + x)) = (40 + 4 * x).toByte
      px(3 * (y * w + x) + 1) = (200 - 3 * y).toByte
      px(3 * (y * w + x) + 2) = (60 + 2 * x + 3 * y).toByte
    }
    val flat420 = JpegCodec.encode(px, w, h, channels = 3,
      quant = JpegCodec.unitQuant, subsample = true)
    val flat444 = JpegCodec.encode(px, w, h, channels = 3,
      quant = JpegCodec.unitQuant)
    val d420 = JpegCodec.decode(flat420)
    assert(d420.width == w && d420.height == h && d420.channels == 3)
    // near-lossless quantizer: error is subsampling + rounding only
    val maxErr = px.indices.map(i =>
      math.abs((d420.pixels(i) & 0xff) - (px(i) & 0xff))).max
    assert(maxErr <= 8,
      s"smooth-gradient 4:2:0 roundtrip drifted $maxErr levels")
    // the subsampled stream is genuinely smaller: 6 blocks per MCU
    // instead of 12 for the same 16x16 area
    assert(flat420.length < flat444.length,
      s"420=${flat420.length} must be < 444=${flat444.length}")
    // determinism: byte-stable across runs
    assert(java.util.Arrays.equals(flat420,
      JpegCodec.encode(px, w, h, channels = 3,
        quant = JpegCodec.unitQuant, subsample = true)))
    // standard quantizer also decodes (the corpus path)
    val dStd = JpegCodec.decode(JpegCodec.encode(px, w, h,
      channels = 3, subsample = true))
    assert(dStd.width == w && dStd.height == h && dStd.channels == 3)
  }

  test("4:2:0 with dims NOT multiples of 16 exercises edge-replicated " +
      "partial MCUs and still round-trips") {
    val (w, h) = (19, 13)
    val px = Array.tabulate(w * h * 3)(i => (32 + (i * 7) % 64).toByte)
    val dec = JpegCodec.decode(
      JpegCodec.encode(px, w, h, channels = 3, subsample = true))
    assert(dec.width == w && dec.height == h && dec.channels == 3)
    assert(dec.pixels.length == w * h * 3)
    // plausibility: mean within the DC + chroma-average bound
    def mean(a: Array[Byte], c: Int) = {
      val vs = a.indices.collect { case i if i % 3 == c => a(i) & 0xff }
      vs.sum.toDouble / vs.length
    }
    (0 until 3).foreach { c =>
      assert(math.abs(mean(dec.pixels, c) - mean(px, c)) <= 6.0,
        s"channel $c mean drifted")
    }
  }

  test("EVERY truncation and every lying segment length fails the " +
      "contract's way — IllegalArgumentException, never a raw index " +
      "error escaping to kill a task") {
    val good = JpegCodec.encode(raster(20 * 9, 5), 20, 9)
    // exhaustive prefix sweep: decode(prefix) must either succeed
    // (truncation past the last needed scan byte) or throw IAE
    (0 until good.length).foreach { n =>
      try { JpegCodec.decode(good.take(n)); () }
      catch {
        case _: IllegalArgumentException => () // the contract
        case other: Throwable =>
          fail(s"truncation at $n escaped as $other")
      }
    }
    // lying declared lengths: shrink each marker segment's length
    // field so its table would read past the declared end
    def findMarker(m: Int): Int = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == m))
        i += 1
      i
    }
    def withLen(at: Int, len: Int): Array[Byte] = {
      val b = good.clone()
      b(at + 2) = ((len >> 8) & 0xff).toByte
      b(at + 3) = (len & 0xff).toByte
      b
    }
    for (m <- Seq(0xc0, 0xc4, 0xdb, 0xda); shortLen <- Seq(2, 3, 8)) {
      val at = findMarker(m)
      try { JpegCodec.decode(withLen(at, shortLen)); () }
      catch {
        case _: IllegalArgumentException => ()
        case other: Throwable =>
          fail(f"marker ff$m%02x with lying length $shortLen " +
            s"escaped as $other")
      }
    }
  }

  test("the Spark seam: corpus JPEGs decode to the exact header " +
      "facts with DC-bounded means; a corrupted payload degrades to " +
      "a null row") {
    val texts = Map(1L -> "the quick brown fox jumps over it",
      2L -> "z" * 120, 3L -> "")
    val docs = texts.toSeq.toDF("doc_id", "text")
    def srcMean(text: String): Double = {
      val b = text.getBytes("UTF-8")
      val w = 8 + b.length % 57
      val h = math.max(1, (b.length + w - 1) / w)
      (b.map(_ & 0xff).sum.toDouble + 32.0 * (w * h - b.length)) /
        (w * h)
    }
    // attach the per-doc source means driver-side (3 rows)
    val rows = Multimodal.withJpegPayload(docs).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1),
        r.getString(2), srcMean(texts(r.getLong(0)))))
    val withMeans = rows.toSeq
      .toDF("media_id", "payload", "media_type", "source_mean")
    val f = Multimodal.extractJpegFeatures(spark, withMeans)
      .collect().map(r => r.media_id -> r).toMap
    assert(f(1L).width.contains(8 + 33 % 57) &&
      f(1L).height.contains(1) && f(1L).channels.contains(1))
    assert(f(1L).mean_close.contains(true))
    assert(f(2L).width.contains(8 + 120 % 57) &&
      f(2L).mean_close.contains(true))
    assert(f(3L).width.contains(8) && f(3L).height.contains(1),
      "empty text is one all-pad block")
    // doc 2 truncated mid-scan: null row, others unaffected
    val corrupted = rows.map { case (id, p, t, m) =>
      (id, if (id == 2L) p.take(p.length / 2) else p, t, m)
    }.toSeq.toDF("media_id", "payload", "media_type", "source_mean")
    val g = Multimodal.extractJpegFeatures(spark, corrupted)
      .collect().map(r => r.media_id -> r).toMap
    assert(g(2L).width.isEmpty && g(2L).mean_close.isEmpty &&
      g(2L).byte_len > 0)
    assert(g(1L).width == f(1L).width)
  }

  // ---- progressive (SOF2) ----

  test("progressive ≡ baseline BIT FOR BIT: spectral selection + " +
      "successive approximation reorder the same coefficients, so " +
      "the reconstructions must be identical — every profile, " +
      "partial MCUs included") {
    val cases = Seq(
      (20, 13, 1, false, JpegCodec.stdQuant),  // gray, partial blocks
      (16, 16, 1, false, JpegCodec.unitQuant), // gray, exact blocks
      (8, 8, 1, false, JpegCodec.stdQuant),    // single block
      (24, 17, 3, false, JpegCodec.stdQuant),  // RGB 4:4:4
      (32, 32, 3, true, JpegCodec.stdQuant),   // RGB 4:2:0 full MCUs
      (20, 13, 3, true, JpegCodec.stdQuant))   // RGB 4:2:0 partial MCU
    cases.zipWithIndex.foreach { case ((w, h, ch, sub, q), i) =>
      val px = raster(w * h * ch, 1000 + i)
      val base = JpegCodec.decode(
        JpegCodec.encode(px, w, h, channels = ch, quant = q,
          subsample = sub))
      val prog = JpegCodec.decode(
        JpegCodec.encodeProgressive(px, w, h, channels = ch, quant = q,
          subsample = sub))
      assert(prog.width == base.width && prog.height == base.height &&
        prog.channels == base.channels, s"case $i dims")
      assert(prog.pixels.toSeq == base.pixels.toSeq,
        s"case $i: progressive and baseline reconstructions diverged")
    }
  }

  test("progressive EOB runs: a flat image (every AC band empty — " +
      "maximal EOBn runs) and a sparse one (isolated features — " +
      "long runs broken by coefficient blocks) both roundtrip " +
      "identically to baseline") {
    val flat = Array.fill[Byte](64 * 48)(119)
    assert(JpegCodec.decode(JpegCodec.encodeProgressive(flat, 64, 48))
      .pixels.toSeq ==
      JpegCodec.decode(JpegCodec.encode(flat, 64, 48)).pixels.toSeq)
    // one bright dot per 16x16 region: most blocks fold into EOB
    // runs, a few carry coefficients — exercises run flush ordering
    val sparse = Array.fill[Byte](64 * 48)(90)
    (0 until 48 by 16).foreach(y => (0 until 64 by 16).foreach(x =>
      sparse(y * 64 + x) = -1)) // 255
    assert(JpegCodec.decode(
      JpegCodec.encodeProgressive(sparse, 64, 48)).pixels.toSeq ==
      JpegCodec.decode(JpegCodec.encode(sparse, 64, 48)).pixels.toSeq)
  }

  test("progressive is deterministic on the wire and refuses " +
      "malformations loudly (truncation, bad approximation sequence)") {
    val px = raster(24 * 16, 7)
    val a = JpegCodec.encodeProgressive(px, 24, 16)
    val b = JpegCodec.encodeProgressive(px, 24, 16)
    assert(a.toSeq == b.toSeq, "byte-stable")
    intercept[IllegalArgumentException] {
      JpegCodec.decode(a.dropRight(8)) // truncated: lost EOI or scan
    }
    // tamper the FIRST SOS's approximation byte (Al=1 -> Ah=3,Al=1
    // would claim a refinement without the preceding pass)
    val sosAt = {
      var i = 2
      while (!((a(i) & 0xff) == 0xff && (a(i + 1) & 0xff) == 0xda))
        i += 1
      i
    }
    val ns = a(sosAt + 4) & 0xff
    val bad = a.clone()
    bad(sosAt + 4 + 1 + 2 * ns + 2) = 0x31.toByte // Ah=3, Al=1
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decode(bad)
    }
    assert(e.getMessage.contains("successive approximation"))
  }

  test("refinement ZRL ordering: a strong low-frequency coefficient " +
      "stranded between a 16+ zero run and a late ±1 keeps its " +
      "correction bit in the right symbol window") {
    // pixels synthesized from a chosen spectrum: one mid-band cosine
    // (a previously-significant coefficient ~20 zigzag positions in)
    // plus a faint checkerboard (a ±1 at zigzag 63), zeros between —
    // the exact shape that misorders correction bits if ZRLs flush
    // only at newly-significant coefficients
    val w = 24; val h = 16
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 128.0 +
          20.0 * math.cos((2 * (y % 8) + 1) * 5 * math.Pi / 16) +
          3.0 * math.cos((2 * (y % 8) + 1) * 7 * math.Pi / 16) *
            math.cos((2 * (x % 8) + 1) * 7 * math.Pi / 16)
        px(y * w + x) = math.max(0, math.min(255, math.round(v).toInt))
          .toByte
        x += 1
      }
      y += 1
    }
    val base = JpegCodec.decode(
      JpegCodec.encode(px, w, h, quant = JpegCodec.unitQuant))
    val prog = JpegCodec.decode(
      JpegCodec.encodeProgressive(px, w, h, quant = JpegCodec.unitQuant))
    assert(prog.pixels.toSeq == base.pixels.toSeq)
  }

  test("the progressive Spark seam: gray / 4:4:4 / 4:2:0 corpus " +
      "payloads all decode bit-identically to their baseline twins; " +
      "null text degrades to a row, not a failure") {
    val docs = Seq(
      (0L, "gray payload exercising the single-component scans"),
      (1L, "an rgb 4:4:4 document with enough text to span blocks"),
      (2L, "and the 4:2:0 twin covering the interleaved MCU path"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = Multimodal.extractJpegProgFeatures(spark, docs)
      .collect().sortBy(_.media_id)
    assert(rows.length == 4)
    assert(rows.forall(_.bit_identical.contains(true)),
      s"every payload must reconstruct identically: ${rows.toSeq}")
    assert(rows(0).channels.contains(1) &&
      rows(1).channels.contains(3) && rows(2).channels.contains(3))
  }
}
