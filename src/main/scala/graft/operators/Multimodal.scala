package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The decode kernel is a REAL pure-JVM decoder for binary PGM (P5,
  * the Netpbm portable graymap — a public uncompressed format:
  * ASCII header `P5 <w> <h> <maxval>` with `#` comments, then raw
  * gray bytes). Payloads are synthesized from the documents corpus by
  * [[PgmCodec.encode]] (byte-accurate fixtures), and
  * [[extractFeatures]] genuinely parses them back — header scan,
  * dimension parse, pixel-block bounds check, per-pixel statistics —
  * behind a `mapPartitions` seam (the Scala analogue of `mapInPandas`
  * batches, where a JNI/codec handle would be amortized per
  * partition; a compressed-format codec drops into [[PgmCodec]]
  * without touching the operator shape).
  *
  * Scale: payloads never shuffle — metadata extraction and frame-index
  * generation are per-row; any groupBy happens on the small extracted
  * feature columns only.
  */
object Multimodal {

  final case class MediaFeatures(media_id: Long, byte_len: Long,
      width: Int, height: Int, maxval: Int, mean_gray: Double,
      feature_hash: String)

  final case class PgmImage(width: Int, height: Int, maxval: Int,
      pixels: Array[Byte])

  /** Binary PGM (P5) codec — pure JVM, no native dependency. */
  object PgmCodec {
    /** Serializes gray bytes as a P5 PGM: `P5\n<w> <h>\n<maxval>\n`
      * then exactly w·h raw bytes (truncating/space-padding `gray`). */
    def encode(gray: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dims ${width}x$height")
      val header = s"P5\n$width $height\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val pixels = java.util.Arrays.copyOf(gray, width * height)
      if (gray.length < pixels.length)
        java.util.Arrays.fill(pixels, gray.length, pixels.length, ' '.toByte)
      header ++ pixels
    }

    /** Parses a P5 PGM: validates the magic, reads the three header
      * integers through Netpbm whitespace/`#`-comment rules, requires
      * the single whitespace byte before the raster, and bounds-checks
      * the pixel block. Throws IllegalArgumentException on malformed
      * input — a decode failure must surface, not fake features. */
    def decode(payload: Array[Byte]): PgmImage = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"PGM decode: $msg")
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '5')
        fail("missing P5 magic")
      var pos = 2
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\n' || b == '\r' || b == '\t'
      def skipWsAndComments(): Unit = {
        var more = true
        while (more && pos < payload.length) {
          if (isWs(payload(pos))) pos += 1
          else if (payload(pos) == '#') {
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          } else more = false
        }
      }
      def readInt(what: String): Int = {
        skipWsAndComments()
        val start = pos
        var v = 0
        while (pos < payload.length && payload(pos) >= '0' &&
            payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0')
          if (v > (1 << 24)) fail(s"$what out of range")
          pos += 1
        }
        if (pos == start) fail(s"missing $what")
        v
      }
      val w = readInt("width")
      val h = readInt("height")
      val mv = readInt("maxval")
      if (w == 0 || h == 0) fail(s"degenerate dims ${w}x$h")
      if (mv == 0 || mv > 255) fail(s"unsupported maxval $mv")
      if (pos >= payload.length || !isWs(payload(pos)))
        fail("missing raster separator")
      pos += 1
      if (payload.length - pos < w * h)
        fail(s"truncated raster: need ${w * h}, have ${payload.length - pos}")
      PgmImage(w, h, mv,
        java.util.Arrays.copyOfRange(payload, pos, pos + w * h))
    }
  }

  final case class RgbFeatures(media_id: Long, byte_len: Long,
      width: Option[Int], height: Option[Int], maxval: Option[Int],
      mean_r: Option[Double], mean_g: Option[Double],
      mean_b: Option[Double], feature_hash: String)

  final case class PpmImage(width: Int, height: Int, maxval: Int,
      pixels: Array[Byte]) // RGB interleaved, 3·w·h bytes

  /** Binary PPM (P6, the Netpbm portable pixmap — RGB) codec. Same
    * header grammar as P5 but the raster is 3·w·h interleaved RGB
    * bytes — the second format behind the [[PgmCodec]] seam, proving
    * the mapPartitions codec shape generalizes beyond grayscale. */
  object PpmCodec {
    /** Serializes RGB bytes as a P6 PPM: `P6\n<w> <h>\n<maxval>\n`
      * then exactly 3·w·h raw bytes (truncating/space-padding). */
    def encode(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dims ${width}x$height")
      val header = s"P6\n$width $height\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val pixels = java.util.Arrays.copyOf(rgb, 3 * width * height)
      if (rgb.length < pixels.length)
        java.util.Arrays.fill(pixels, rgb.length, pixels.length, ' '.toByte)
      header ++ pixels
    }

    /** Parses a P6 PPM through the same Netpbm whitespace/comment
      * rules as [[PgmCodec.decode]]; throws IllegalArgumentException
      * on malformed input (callers choose throw-vs-null policy). */
    def decode(payload: Array[Byte]): PpmImage = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"PPM decode: $msg")
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
        fail("missing P6 magic")
      var pos = 2
      def isWs(b: Byte): Boolean =
        b == ' ' || b == '\n' || b == '\r' || b == '\t'
      def skipWsAndComments(): Unit = {
        var more = true
        while (more && pos < payload.length) {
          if (isWs(payload(pos))) pos += 1
          else if (payload(pos) == '#') {
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          } else more = false
        }
      }
      def readInt(what: String): Int = {
        skipWsAndComments()
        val start = pos
        var v = 0
        while (pos < payload.length && payload(pos) >= '0' &&
            payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0')
          if (v > (1 << 24)) fail(s"$what out of range")
          pos += 1
        }
        if (pos == start) fail(s"missing $what")
        v
      }
      val w = readInt("width")
      val h = readInt("height")
      val mv = readInt("maxval")
      if (w == 0 || h == 0) fail(s"degenerate dims ${w}x$h")
      if (mv == 0 || mv > 255) fail(s"unsupported maxval $mv")
      if (pos >= payload.length || !isWs(payload(pos)))
        fail("missing raster separator")
      pos += 1
      if (payload.length - pos < 3 * w * h)
        fail(s"truncated raster: need ${3 * w * h}, " +
          s"have ${payload.length - pos}")
      PpmImage(w, h, mv,
        java.util.Arrays.copyOfRange(payload, pos, pos + 3 * w * h))
    }
  }

  final case class PngImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  final case class PngFeatures(media_id: Long, byte_len: Long,
      width: Option[Int], height: Option[Int], channels: Option[Int],
      mean_level: Option[Double], raster_md5: Option[String])

  /** Minimal canonical PNG codec (ISO/IEC 15948 / RFC 2083 — public
    * spec): 8-bit greyscale (colour type 0), truecolour (2) and
    * truecolour-with-alpha (6), non-interlaced — the real-corpus
    * image format behind the same mapPartitions seam as the Netpbm
    * and WAV codecs. Decode handles the full per-row filter set
    * (None/Sub/Up/Average/Paeth), multi-chunk IDAT streams, ancillary
    * chunk skipping and per-chunk CRC verification; encode writes a
    * caller-chosen filter and IDAT split so the spec can round-trip
    * every decode path. zlib via `java.util.zip` — pure JVM, no
    * imageio/native dependency. Malformed input throws
    * IllegalArgumentException (callers choose fail vs null-not-fail,
    * same policy as the other codecs). */
  object PngCodec {
    private val SIG = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
      0x1a, 0x0a).map(_.toByte)

    private def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte,
        v.toByte)

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a)
      val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def writeChunk(out: java.io.ByteArrayOutputStream,
        typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(t)
      crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }

    /** Encode `pixels` (row-major, interleaved channels) as a PNG.
      * `filter` (0–4) is applied to every row; `idatChunkBytes`
      * splits the zlib stream across IDAT chunks (real encoders do —
      * the decoder must reassemble). */
    def encode(pixels: Array[Byte], width: Int, height: Int,
        channels: Int = 1, filter: Int = 0,
        idatChunkBytes: Int = Int.MaxValue): Array[Byte] = {
      require(channels == 1 || channels == 3 || channels == 4,
        s"channels $channels not in {1, 3, 4}")
      require(filter >= 0 && filter <= 4, s"filter $filter")
      require(idatChunkBytes > 0, "idatChunkBytes must be positive")
      val stride = width * channels
      require(pixels.length == stride * height,
        s"raster size ${pixels.length} != $width x $height x $channels")
      val raw = new Array[Byte](height * (1 + stride))
      var y = 0
      while (y < height) {
        raw(y * (1 + stride)) = filter.toByte
        var x = 0
        while (x < stride) {
          val cur = pixels(y * stride + x) & 0xff
          val left =
            if (x >= channels) pixels(y * stride + x - channels) & 0xff
            else 0
          val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
          val ul =
            if (x >= channels && y > 0)
              pixels((y - 1) * stride + x - channels) & 0xff
            else 0
          val f = filter match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case 4 => cur - paeth(left, up, ul)
          }
          raw(y * (1 + stride) + 1 + x) = f.toByte
          x += 1
        }
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw)
      deflater.finish()
      val zout = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!deflater.finished())
        zout.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val z = zout.toByteArray
      val colorType = channels match {
        case 1 => 0
        case 3 => 2
        case 4 => 6
      }
      val ihdr = be32(width) ++ be32(height) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)
      val out = new java.io.ByteArrayOutputStream()
      out.write(SIG, 0, SIG.length)
      writeChunk(out, "IHDR", ihdr)
      var off = 0
      while (off < z.length || off == 0) {
        val n = math.min(idatChunkBytes, z.length - off)
        writeChunk(out, "IDAT",
          java.util.Arrays.copyOfRange(z, off, off + n))
        off += math.max(n, 1) // emit ≥1 IDAT even for an empty stream
      }
      writeChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Parse a PNG: signature, chunk walk with CRC checks, IHDR
      * validation (8-bit depth, colour type 0/2/6, no interlace),
      * IDAT reassembly + inflate, per-row unfilter. Throws
      * IllegalArgumentException on ANY malformation. */
    def decode(payload: Array[Byte]): PngImage = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"PNG decode: $msg")
      if (payload.length < 8 ||
          !SIG.indices.forall(i => payload(i) == SIG(i)))
        fail("bad signature")
      def u32(at: Int): Int =
        ((payload(at) & 0xff) << 24) | ((payload(at + 1) & 0xff) << 16) |
          ((payload(at + 2) & 0xff) << 8) | (payload(at + 3) & 0xff)
      var pos = 8
      var width = -1
      var height = -1
      var channels = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        if (pos + 8 > payload.length) fail("truncated chunk header")
        val len = u32(pos)
        if (len < 0 || pos.toLong + 12 + len > payload.length)
          fail("truncated chunk")
        val typ = new String(payload, pos + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val crc = new java.util.zip.CRC32
        crc.update(payload, pos + 4, 4 + len)
        if (crc.getValue.toInt != u32(pos + 8 + len))
          fail(s"$typ crc mismatch")
        typ match {
          case "IHDR" =>
            if (len != 13) fail("IHDR length")
            width = u32(pos + 8)
            height = u32(pos + 12)
            val depth = payload(pos + 16) & 0xff
            if (depth != 8) fail(s"unsupported bit depth $depth")
            channels = (payload(pos + 17) & 0xff) match {
              case 0 => 1
              case 2 => 3
              case 6 => 4
              case c => fail(s"unsupported colour type $c")
            }
            if ((payload(pos + 18) & 0xff) != 0 ||
                (payload(pos + 19) & 0xff) != 0)
              fail("nonstandard compression/filter method")
            if ((payload(pos + 20) & 0xff) != 0)
              fail("interlaced PNG unsupported")
            if (width <= 0 || height <= 0 ||
                width.toLong * height * channels > (1L << 30))
              fail(s"bad dimensions ${width}x$height")
          case "IDAT" =>
            if (width < 0) fail("IDAT before IHDR")
            idat.write(payload, pos + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunk: skip
        }
        pos += 12 + len
      }
      if (width < 0) fail("missing IHDR")
      val stride = width * channels
      val raw = new Array[Byte](height * (1 + stride))
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      try {
        while (off < raw.length && !inf.finished()) {
          val n =
            try inf.inflate(raw, off, raw.length - off)
            catch {
              case e: java.util.zip.DataFormatException =>
                fail(s"corrupt zlib stream: ${e.getMessage}")
            }
          if (n == 0 && inf.needsInput()) fail("truncated pixel data")
          off += n
        }
      } finally inf.end()
      if (off != raw.length) fail("truncated pixel data")
      val px = new Array[Byte](height * stride)
      var y = 0
      while (y < height) {
        val ft = raw(y * (1 + stride)) & 0xff
        if (ft > 4) fail(s"bad row filter $ft")
        var x = 0
        while (x < stride) {
          val v = raw(y * (1 + stride) + 1 + x) & 0xff
          val left =
            if (x >= channels) px(y * stride + x - channels) & 0xff
            else 0
          val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
          val ul =
            if (x >= channels && y > 0)
              px((y - 1) * stride + x - channels) & 0xff
            else 0
          val r = ft match {
            case 0 => v
            case 1 => v + left
            case 2 => v + up
            case 3 => v + (left + up) / 2
            case 4 => v + paeth(left, up, ul)
          }
          px(y * stride + x) = r.toByte
          x += 1
        }
        y += 1
      }
      PngImage(width, height, channels, px)
    }
  }

  /** Synthesize REAL PNG payloads from the corpus — the same raster
    * geometry as [[withPgmPayload]] (width 8 + n mod 57, space-padded
    * greyscale), so the decoded-pixel oracle is shared arithmetic;
    * the bytes on the wire are genuine compressed PNG. */
  def withPngPayload(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = 8 + (bytes.length % 57)
        val h = math.max(1, (bytes.length + w - 1) / w)
        val padded = java.util.Arrays.copyOf(bytes, w * h)
        java.util.Arrays.fill(padded, bytes.length, w * h, ' '.toByte)
        (id, PngCodec.encode(padded, w, h), "image/png")
      }
      .toDF("media_id", "payload", "media_type")
  }

  /** Decode + feature extraction over PNG payloads through the same
    * mapPartitions seam, null-not-fail policy: dimensions, channel
    * count, mean level over the DECODED raster, and the decoded-pixel
    * md5 (the compressed wire bytes are not oracle arithmetic; the
    * raster is). A malformed payload degrades to null decode columns
    * (byte_len survives), never a task failure. */
  def extractPngFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[PngFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          try {
            val img = PngCodec.decode(payload)
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) {
              sum += img.pixels(i) & 0xff
              i += 1
            }
            md.reset()
            val digest = md.digest(img.pixels)
              .map("%02x".format(_)).mkString
            PngFeatures(id, payload.length.toLong, Some(img.width),
              Some(img.height), Some(img.channels),
              Some(sum.toDouble / img.pixels.length), Some(digest))
          } catch {
            case _: IllegalArgumentException =>
              PngFeatures(id, payload.length.toLong, None, None, None,
                None, None)
          }
        }
      }
  }

  final case class JpegImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  final case class JpegFeatures(media_id: Long, byte_len: Long,
      width: Option[Int], height: Option[Int], channels: Option[Int],
      mean_level: Option[Double], mean_close: Option[Boolean])

  /** Baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec):
    * sequential DCT, 8-bit, grayscale or 4:4:4 YCbCr (no chroma
    * subsampling), canonical Huffman entropy coding with byte
    * stuffing — the LOSSY real-corpus format completing the image
    * seam (PNG covers the lossless one). Pure JVM, no imageio.
    *
    * Decode is fully general over its supported profile: DQT/DHT/
    * SOF0/SOF2/SOS marker walk, canonical Huffman tables rebuilt from
    * any DHT (mincode/maxcode/valptr), FF00 unstuffing, DC prediction,
    * AC run-length, dequantize + dezigzag, separable double-precision
    * IDCT, level shift + clamp, block-padding crop, JFIF YCbCr→RGB.
    * PROGRESSIVE (SOF2) decodes in full generality within the
    * profile: spectral selection, successive approximation (DC and AC
    * first/refinement passes, EOBn runs, correction bits), tables
    * redefined between scans. 12-bit, arithmetic coding, 4:2:2 and
    * restart-interval streams refuse LOUDLY — a decode must never
    * guess. Encode writes the same profile with FIXED-LENGTH
    * canonical Huffman tables (all 12 DC size symbols at 4 bits, all
    * 162 AC symbols at 8 bits — a valid prefix code by the DHT
    * grammar, chosen over the Annex K optimum because correctness
    * here beats compression ratio) and edge-replicated block padding.
    *
    * Determinism: every transform is fixed-order double arithmetic +
    * rounding on the JVM — encode∘decode is bit-stable across runs,
    * so specs can pin exact reconstructions; quantization makes the
    * roundtrip LOSSY by design (tolerance-asserted, with the all-ones
    * quant table as the near-lossless control). */
  object JpegCodec {
    private val zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** The T.81 Annex K.1 example luminance quantizer — the standard
      * "quality 50" table every tutorial and library ships. */
    val stdQuant: Array[Int] = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)

    /** Near-lossless control table (every step 1): isolates DCT/IDCT
      * rounding from quantization loss in the specs. */
    val unitQuant: Array[Int] = Array.fill(64)(1)

    // cos((2x+1)·u·π/16) for x, u in 0..7 — the entire DCT basis; the
    // inner loops must read a table, not call math.cos 4096× per block
    private val cosT: Array[Array[Double]] = Array.tabulate(8, 8)(
      (x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
    private val cNorm: Array[Double] = Array.tabulate(8)(
      u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)

    // encode-side fixed-length canonical tables: DC sizes 0..11 at 4
    // bits (codes 0..11, all-ones 15 unused), AC symbols at 8 bits
    // (codes 0..161, all-ones 255 unused)
    private val dcSymbols: Array[Int] = (0 to 11).toArray
    private val acSymbols: Array[Int] = {
      val syms = scala.collection.mutable.ArrayBuffer(0x00, 0xf0)
      for (run <- 0 to 15; size <- 1 to 10) syms += ((run << 4) | size)
      syms.toArray.sorted
    }
    private val dcCode: Map[Int, (Int, Int)] =
      dcSymbols.zipWithIndex.map { case (s, i) => s -> (i, 4) }.toMap
    private val acCode: Map[Int, (Int, Int)] =
      acSymbols.zipWithIndex.map { case (s, i) => s -> (i, 8) }.toMap
    // the progressive AC alphabet adds the EOBn run symbols
    // (r<<4)|0 for r = 1..14 — end-of-band runs up to 32767 blocks
    private val acSymbolsProg: Array[Int] =
      (acSymbols ++ (1 to 14).map(_ << 4)).sorted
    private val acCodeProg: Map[Int, (Int, Int)] =
      acSymbolsProg.zipWithIndex.map { case (s, i) => s -> (i, 8) }.toMap

    private def fdctQuant(block: Array[Double], quant: Array[Int])
        : Array[Int] = {
      // separable forward DCT-II, fixed evaluation order
      val tmp = new Array[Double](64)
      val out = new Array[Int](64)
      var u = 0
      while (u < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var y = 0
          while (y < 8) {
            s += block(x * 8 + y) * cosT(y)(u)
            y += 1
          }
          tmp(x * 8 + u) = s
          x += 1
        }
        u += 1
      }
      var v = 0
      while (v < 8) {
        var u2 = 0
        while (u2 < 8) {
          var s = 0.0
          var x = 0
          while (x < 8) {
            s += tmp(x * 8 + u2) * cosT(x)(v)
            x += 1
          }
          val coeff = 0.25 * cNorm(u2) * cNorm(v) * s
          out(v * 8 + u2) =
            math.round(coeff / quant(v * 8 + u2)).toInt
          u2 += 1
        }
        v += 1
      }
      out
    }

    private def dequantIdct(coefZz: Array[Int], quant: Array[Int])
        : Array[Int] = {
      val f = new Array[Double](64)
      var i = 0
      while (i < 64) {
        f(zigzag(i)) = coefZz(i).toDouble * quant(zigzag(i))
        i += 1
      }
      // separable inverse: rows first (u → x), then columns (v → y)
      val tmp = new Array[Double](64)
      var v = 0
      while (v < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var u = 0
          while (u < 8) {
            s += cNorm(u) * f(v * 8 + u) * cosT(x)(u)
            u += 1
          }
          tmp(v * 8 + x) = s
          x += 1
        }
        v += 1
      }
      val out = new Array[Int](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var v2 = 0
          while (v2 < 8) {
            s += cNorm(v2) * tmp(v2 * 8 + x) * cosT(y)(v2)
            v2 += 1
          }
          val p = math.round(s / 4.0 + 128.0).toInt
          out(y * 8 + x) = math.max(0, math.min(255, p))
          x += 1
        }
        y += 1
      }
      out
    }

    private final class BitWriter {
      val out = new java.io.ByteArrayOutputStream()
      private var acc = 0L
      private var nbits = 0
      def put(code: Int, len: Int): Unit = {
        acc = (acc << len) | (code & ((1L << len) - 1))
        nbits += len
        while (nbits >= 8) {
          val b = ((acc >>> (nbits - 8)) & 0xff).toInt
          out.write(b)
          if (b == 0xff) out.write(0x00) // byte stuffing
          nbits -= 8
        }
      }
      def flush(): Unit = if (nbits > 0) put(0x7f, 8 - nbits) // 1-pad
    }

    private def sizeOf(v: Int): Int = {
      var m = math.abs(v)
      var n = 0
      while (m != 0) { m >>= 1; n += 1 }
      n
    }

    /** Component planes + sampling geometry shared by the baseline
      * and progressive encoders: RGB→YCbCr (BT.601 full-range, the
      * JFIF matrix), optional 2x2 box-averaged chroma downsample
      * (round half up, edge replication — integer arithmetic so the
      * transform is engine-exact), and the MCU grid dims. */
    private final case class Prep(planes: Array[Array[Int]],
        sampH: Array[Int], sampV: Array[Int], compW: Array[Int],
        compH: Array[Int], mcuCols: Int, mcuRows: Int)

    private def preparePlanes(pixels: Array[Byte], width: Int,
        height: Int, channels: Int, subsample: Boolean): Prep = {
      // full-resolution component planes
      val full: Array[Array[Int]] =
        if (channels == 1)
          Array(pixels.map(_ & 0xff))
        else {
          val y = new Array[Int](width * height)
          val cb = new Array[Int](width * height)
          val cr = new Array[Int](width * height)
          var i = 0
          while (i < width * height) {
            val r = pixels(3 * i) & 0xff
            val g = pixels(3 * i + 1) & 0xff
            val b = pixels(3 * i + 2) & 0xff
            y(i) = math.max(0, math.min(255, math.round(
              0.299 * r + 0.587 * g + 0.114 * b).toInt))
            cb(i) = math.max(0, math.min(255, math.round(
              -0.168736 * r - 0.331264 * g + 0.5 * b + 128).toInt))
            cr(i) = math.max(0, math.min(255, math.round(
              0.5 * r - 0.418688 * g - 0.081312 * b + 128).toInt))
            i += 1
          }
          Array(y, cb, cr)
        }
      // per-component sampling factors + (possibly downsampled) planes
      val sampH = Array.tabulate(channels)(c =>
        if (subsample && c == 0) 2 else 1)
      val sampV = sampH.clone()
      val hMax = sampH.max
      val vMax = sampV.max
      // component plane dims at its own resolution
      val compW = Array.tabulate(channels)(c =>
        (width * sampH(c) + hMax - 1) / hMax)
      val compH = Array.tabulate(channels)(c =>
        (height * sampV(c) + vMax - 1) / vMax)
      val planes: Array[Array[Int]] = Array.tabulate(channels) { c =>
        if (compW(c) == width && compH(c) == height) full(c)
        else {
          val p = new Array[Int](compW(c) * compH(c))
          var cy = 0
          while (cy < compH(c)) {
            var cx = 0
            while (cx < compW(c)) {
              var sum = 0
              var dy = 0
              while (dy < 2) {
                val sy = math.min(height - 1, 2 * cy + dy)
                var dx = 0
                while (dx < 2) {
                  val sx = math.min(width - 1, 2 * cx + dx)
                  sum += full(c)(sy * width + sx)
                  dx += 1
                }
                dy += 1
              }
              p(cy * compW(c) + cx) = (sum + 2) / 4
              cx += 1
            }
            cy += 1
          }
          p
        }
      }
      Prep(planes, sampH, sampV, compW, compH,
        (width + 8 * hMax - 1) / (8 * hMax),
        (height + 8 * vMax - 1) / (8 * vMax))
    }

    /** One 8x8 block's quantized coefficients in ZIGZAG order:
      * edge-replicated sampling from the component plane, forward DCT,
      * quantization — the block kernel shared by both encoders. */
    private def blockZz(plane: Array[Int], w: Int, h: Int,
        blockRow: Int, blockCol: Int, quant: Array[Int]): Array[Int] = {
      val block = new Array[Double](64)
      var yy = 0
      while (yy < 8) {
        val sy = math.min(h - 1, blockRow * 8 + yy)
        var xx = 0
        while (xx < 8) {
          val sx = math.min(w - 1, blockCol * 8 + xx)
          block(yy * 8 + xx) = plane(sy * w + sx) - 128.0
          xx += 1
        }
        yy += 1
      }
      val q = fdctQuant(block, quant)
      val zz = new Array[Int](64)
      var i = 0
      while (i < 64) { zz(i) = q(zigzag(i)); i += 1 }
      zz
    }

    /** Encode `pixels` (row-major; 1 = gray, 3 = interleaved RGB) as a
      * baseline JFIF JPEG with quantizer `quant` (zigzag-natural
      * order, applied to every component). `subsample` (3-channel
      * only) writes 4:2:0 — luma at 2x2 sampling, chroma planes
      * box-averaged to half resolution and MCU-interleaved as
      * YYYYCbCr per 16x16 macroblock, the dominant wild-corpus
      * profile. */
    def encode(pixels: Array[Byte], width: Int, height: Int,
        channels: Int = 1, quant: Array[Int] = stdQuant,
        subsample: Boolean = false): Array[Byte] = {
      require(channels == 1 || channels == 3, s"channels $channels")
      require(!subsample || channels == 3,
        "4:2:0 subsampling needs 3 channels")
      require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
        "quant must be 64 steps in [1, 255]")
      require(pixels.length == width * height * channels, "raster size")
      require(width > 0 && height > 0, "degenerate dims")
      val prep = preparePlanes(pixels, width, height, channels, subsample)
      import prep.{planes, sampH, sampV, compW, compH, mcuCols, mcuRows}
      val writer = new BitWriter
      val lastDc = new Array[Int](channels)

      def encodeBlock(c: Int, blockRow: Int, blockCol: Int): Unit = {
        val zz = blockZz(planes(c), compW(c), compH(c), blockRow,
          blockCol, quant)
        val dcDiff = zz(0) - lastDc(c)
        lastDc(c) = zz(0)
        val dsz = sizeOf(dcDiff)
        val (dcode, dlen) = dcCode(dsz)
        writer.put(dcode, dlen)
        if (dsz > 0) {
          val bitsVal =
            if (dcDiff >= 0) dcDiff else dcDiff + (1 << dsz) - 1
          writer.put(bitsVal, dsz)
        }
        var k = 1
        while (k < 64) {
          var run = 0
          while (k < 64 && zz(k) == 0) { run += 1; k += 1 }
          if (k == 64) {
            val (c0, l0) = acCode(0x00) // EOB
            writer.put(c0, l0)
          } else {
            while (run >= 16) {
              val (cz, lz) = acCode(0xf0) // ZRL
              writer.put(cz, lz)
              run -= 16
            }
            val v = zz(k)
            val sz = sizeOf(v)
            val (ca, la) = acCode((run << 4) | sz)
            writer.put(ca, la)
            val bitsVal = if (v >= 0) v else v + (1 << sz) - 1
            writer.put(bitsVal, sz)
            k += 1
          }
        }
      }

      // MCU-interleaved scan (T.81 A.2.3): per macroblock, each
      // component contributes sampV×sampH blocks in raster order —
      // with all factors 1 this degrades to the plain per-block
      // interleave of the 4:4:4 path
      var my = 0
      while (my < mcuRows) {
        var mx = 0
        while (mx < mcuCols) {
          var c = 0
          while (c < channels) {
            var v = 0
            while (v < sampV(c)) {
              var hh = 0
              while (hh < sampH(c)) {
                encodeBlock(c, my * sampV(c) + v, mx * sampH(c) + hh)
                hh += 1
              }
              v += 1
            }
            c += 1
          }
          mx += 1
        }
        my += 1
      }
      writer.flush()
      val scan = writer.out.toByteArray
      // assemble the container
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { out.write(v >>> 8); out.write(v & 0xff) }
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      marker(0xd8) // SOI
      marker(0xdb) // DQT (table 0, 8-bit)
      u16(2 + 1 + 64)
      out.write(0x00)
      zigzag.foreach(z => out.write(quant(z))) // stored in zigzag order
      marker(0xc0) // SOF0
      u16(8 + 3 * channels)
      out.write(8) // precision
      u16(height); u16(width)
      out.write(channels)
      (0 until channels).foreach { c =>
        out.write(c + 1) // component id
        out.write((sampH(c) << 4) | sampV(c)) // sampling factors
        out.write(0)     // quant table 0
      }
      def dht(clazz: Int, id: Int, lengths: Array[Int],
          vals: Array[Int]): Unit = {
        marker(0xc4)
        u16(2 + 1 + 16 + vals.length)
        out.write((clazz << 4) | id)
        lengths.foreach(out.write)
        vals.foreach(out.write)
      }
      val dcLens = Array.tabulate(16)(i => if (i == 3) dcSymbols.length
        else 0) // all DC symbols at length 4
      val acLens = Array.tabulate(16)(i => if (i == 7) acSymbols.length
        else 0) // all AC symbols at length 8
      dht(0, 0, dcLens, dcSymbols)
      dht(1, 0, acLens, acSymbols)
      marker(0xda) // SOS
      u16(6 + 2 * channels)
      out.write(channels)
      (0 until channels).foreach { c =>
        out.write(c + 1)
        out.write(0x00) // DC table 0 / AC table 0
      }
      out.write(0); out.write(63); out.write(0) // Ss/Se/Ah-Al
      out.write(scan, 0, scan.length)
      marker(0xd9) // EOI
      out.toByteArray
    }

    /** Encode the same supported profiles as [[encode]] but as a
      * PROGRESSIVE (SOF2) stream with SUCCESSIVE APPROXIMATION — the
      * scan script the wild corpus actually carries (cjpeg-style):
      *
      *   1. DC first, all components interleaved (Ss=Se=0, Al=1)
      *   2. per component: AC first, band 1..63 at Al=1 (EOBn runs)
      *   3. DC refinement (Ah=1, Al=0 — one raw bit per block)
      *   4. per component: AC refinement (Ah=1, Al=0 — correction
      *      bits, ±1 insertions, buffered-bit EOB runs)
      *
      * The quantized coefficients are EXACTLY the baseline encoder's
      * (same [[blockZz]] kernel), progressive being a pure reordering
      * of the same data — so decode(encodeProgressive(x)) must equal
      * decode(encode(x)) BIT FOR BIT, which is what the spec pins. */
    def encodeProgressive(pixels: Array[Byte], width: Int, height: Int,
        channels: Int = 1, quant: Array[Int] = stdQuant,
        subsample: Boolean = false): Array[Byte] = {
      require(channels == 1 || channels == 3, s"channels $channels")
      require(!subsample || channels == 3,
        "4:2:0 subsampling needs 3 channels")
      require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
        "quant must be 64 steps in [1, 255]")
      require(pixels.length == width * height * channels, "raster size")
      require(width > 0 && height > 0, "degenerate dims")
      val prep = preparePlanes(pixels, width, height, channels, subsample)
      import prep.{planes, sampH, sampV, compW, compH, mcuCols, mcuRows}
      // all coefficients up front: the scans are reorderings
      val gridW = Array.tabulate(channels)(c => mcuCols * sampH(c))
      val gridH = Array.tabulate(channels)(c => mcuRows * sampV(c))
      val coef: Array[Array[Array[Int]]] = Array.tabulate(channels) { c =>
        Array.tabulate(gridW(c) * gridH(c)) { b =>
          blockZz(planes(c), compW(c), compH(c),
            b / gridW(c), b % gridW(c), quant)
        }
      }

      // ---- entropy coders for the four scan kinds ----
      def dcFirstScan(al: Int): Array[Byte] = {
        val w = new BitWriter
        val lastDc = new Array[Int](channels)
        def one(c: Int, b: Int): Unit = {
          val v = coef(c)(b)(0) >> al // DC point transform: arith shift
          val diff = v - lastDc(c)
          lastDc(c) = v
          val s = sizeOf(diff)
          val (dc, dl) = dcCode(s)
          w.put(dc, dl)
          if (s > 0)
            w.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        }
        forEachMcuBlock(one)
        w.flush(); w.out.toByteArray
      }

      def dcRefineScan(al: Int): Array[Byte] = {
        val w = new BitWriter
        forEachMcuBlock((c, b) => w.put((coef(c)(b)(0) >> al) & 1, 1))
        w.flush(); w.out.toByteArray
      }

      // interleaved MCU order over every component's blocks — the
      // same traversal as the baseline scan, used by both DC scans
      def forEachMcuBlock(f: (Int, Int) => Unit): Unit = {
        var my = 0
        while (my < mcuRows) {
          var mx = 0
          while (mx < mcuCols) {
            var c = 0
            while (c < channels) {
              var v = 0
              while (v < sampV(c)) {
                var hh = 0
                while (hh < sampH(c)) {
                  f(c, (my * sampV(c) + v) * gridW(c) +
                    mx * sampH(c) + hh)
                  hh += 1
                }
                v += 1
              }
              c += 1
            }
            mx += 1
          }
          my += 1
        }
      }

      // non-interleaved single-component block coverage: the
      // component's OWN ceil dims, not the MCU-padded grid
      def compBlocks(c: Int): (Int, Int) =
        ((compW(c) + 7) / 8, (compH(c) + 7) / 8)

      def acFirstScan(c: Int, ss: Int, se: Int, al: Int): Array[Byte] = {
        val w = new BitWriter
        var eobrun = 0
        def flushEob(): Unit = if (eobrun > 0) {
          var r = 0
          while ((2 << r) <= eobrun) r += 1 // floor(log2)
          val (ec, el) = acCodeProg(r << 4)
          w.put(ec, el)
          if (r > 0) w.put(eobrun - (1 << r), r)
          eobrun = 0
        }
        def pt(v: Int): Int = if (v >= 0) v >> al else -((-v) >> al)
        val (bw, bh) = compBlocks(c)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            val zz = coef(c)(by * gridW(c) + bx)
            var last = se
            while (last >= ss && pt(zz(last)) == 0) last -= 1
            if (last < ss) {
              eobrun += 1
              if (eobrun == 0x7fff) flushEob()
            } else {
              flushEob()
              var run = 0
              var k = ss
              while (k <= last) {
                val v = pt(zz(k))
                if (v == 0) run += 1
                else {
                  while (run >= 16) {
                    val (zc, zl) = acCodeProg(0xf0)
                    w.put(zc, zl)
                    run -= 16
                  }
                  val s = sizeOf(v)
                  val (ac, alen) = acCodeProg((run << 4) | s)
                  w.put(ac, alen)
                  w.put(if (v >= 0) v else v + (1 << s) - 1, s)
                  run = 0
                }
                k += 1
              }
              if (last < se) eobrun += 1
            }
            bx += 1
          }
          by += 1
        }
        flushEob()
        w.flush(); w.out.toByteArray
      }

      def acRefineScan(c: Int, ss: Int, se: Int, al: Int): Array[Byte] = {
        val w = new BitWriter
        var eobrun = 0
        // correction bits buffered until the symbol that carries them
        val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
        def emitPending(): Unit = {
          pending.foreach(w.put(_, 1)); pending.clear()
        }
        def flushEob(): Unit = if (eobrun > 0) {
          var r = 0
          while ((2 << r) <= eobrun) r += 1
          val (ec, el) = acCodeProg(r << 4)
          w.put(ec, el)
          if (r > 0) w.put(eobrun - (1 << r), r)
          eobrun = 0
          emitPending()
        }
        def pt(v: Int): Int = if (v >= 0) v >> al else -((-v) >> al)
        val (bw, bh) = compBlocks(c)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            val zz = coef(c)(by * gridW(c) + bx)
            // EOB position: the last NEWLY-significant coefficient
            // (|pt| == 1; anything larger was sent in an earlier scan)
            var eobPos = ss - 1
            var k = ss
            while (k <= se) {
              if (math.abs(pt(zz(k))) == 1) eobPos = k
              k += 1
            }
            if (eobPos < ss) {
              // no new coefficients: the whole band folds into the
              // EOB run; corrections for already-known coefficients
              // ride the buffer in block order
              eobrun += 1
              k = ss
              while (k <= se) {
                val t = math.abs(pt(zz(k)))
                if (t > 1) pending += (t & 1)
                k += 1
              }
              if (eobrun == 0x7fff) flushEob()
            } else {
              flushEob()
              var run = 0
              k = ss
              while (k <= eobPos) {
                val t = pt(zz(k))
                val a = math.abs(t)
                if (a == 0) run += 1
                else {
                  // ZRLs flush at ANY nonzero coefficient (T.81 G.7 /
                  // the libjpeg note): a previously-significant
                  // coefficient beyond the 16-zero span must buffer
                  // its correction bit AFTER the ZRL that the decoder
                  // will consume first, or the bit lands inside the
                  // wrong symbol's window
                  while (run > 15) {
                    val (zc, zl) = acCodeProg(0xf0)
                    w.put(zc, zl)
                    run -= 16
                    emitPending()
                  }
                  if (a > 1) pending += (a & 1)
                  else {
                    val (ac, alen) = acCodeProg((run << 4) | 1)
                    w.put(ac, alen)
                    w.put(if (t > 0) 1 else 0, 1) // sign of the new ±1
                    emitPending()
                    run = 0
                  }
                }
                k += 1
              }
              if (eobPos < se) {
                eobrun += 1
                k = eobPos + 1
                while (k <= se) {
                  val t = math.abs(pt(zz(k)))
                  if (t > 1) pending += (t & 1)
                  k += 1
                }
              }
            }
            bx += 1
          }
          by += 1
        }
        flushEob()
        w.flush(); w.out.toByteArray
      }

      // ---- container ----
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { out.write(v >>> 8); out.write(v & 0xff) }
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      marker(0xd8) // SOI
      marker(0xdb) // DQT
      u16(2 + 1 + 64)
      out.write(0x00)
      zigzag.foreach(z => out.write(quant(z)))
      marker(0xc2) // SOF2: progressive DCT
      u16(8 + 3 * channels)
      out.write(8)
      u16(height); u16(width)
      out.write(channels)
      (0 until channels).foreach { c =>
        out.write(c + 1)
        out.write((sampH(c) << 4) | sampV(c))
        out.write(0)
      }
      def dht(clazz: Int, id: Int, lengths: Array[Int],
          vals: Array[Int]): Unit = {
        marker(0xc4)
        u16(2 + 1 + 16 + vals.length)
        out.write((clazz << 4) | id)
        lengths.foreach(out.write)
        vals.foreach(out.write)
      }
      dht(0, 0, Array.tabulate(16)(i =>
        if (i == 3) dcSymbols.length else 0), dcSymbols)
      dht(1, 0, Array.tabulate(16)(i =>
        if (i == 7) acSymbolsProg.length else 0), acSymbolsProg)
      def sos(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int,
          entropy: Array[Byte]): Unit = {
        marker(0xda)
        u16(6 + 2 * comps.length)
        out.write(comps.length)
        comps.foreach { c =>
          out.write(c + 1)
          out.write(0x00)
        }
        out.write(ss); out.write(se); out.write((ah << 4) | al)
        out.write(entropy, 0, entropy.length)
      }
      val all = 0 until channels
      sos(all, 0, 0, 0, 1, dcFirstScan(1))
      all.foreach(c => sos(Seq(c), 1, 63, 0, 1, acFirstScan(c, 1, 63, 1)))
      sos(all, 0, 0, 1, 0, dcRefineScan(0))
      all.foreach(c => sos(Seq(c), 1, 63, 1, 0, acRefineScan(c, 1, 63, 0)))
      marker(0xd9) // EOI
      out.toByteArray
    }

    private final class Huff(bits: Array[Int], vals: Array[Int]) {
      // canonical decode tables (T.81 F.2.2.3)
      val minCode = new Array[Int](17)
      val maxCode = new Array[Int](17)
      val valPtr = new Array[Int](17)
      locally {
        var code = 0
        var k = 0
        var l = 1
        while (l <= 16) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
          if (bits(l - 1) == 0) maxCode(l) = -1
          code <<= 1
          l += 1
        }
      }
      def decode(br: BitReader): Int = {
        var code = br.bit()
        var l = 1
        while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
          code = (code << 1) | br.bit()
          l += 1
        }
        if (l > 16)
          throw new IllegalArgumentException(
            "JPEG decode: invalid huffman code")
        vals(valPtr(l) + code - minCode(l))
      }
    }

    private final class BitReader(data: Array[Byte], var pos: Int) {
      private var acc = 0
      private var nbits = 0
      def bit(): Int = {
        if (nbits == 0) {
          if (pos >= data.length)
            throw new IllegalArgumentException(
              "JPEG decode: truncated scan")
          val b = data(pos) & 0xff
          pos += 1
          if (b == 0xff) {
            if (pos >= data.length)
              throw new IllegalArgumentException(
                "JPEG decode: truncated scan")
            val next = data(pos) & 0xff
            if (next == 0x00) pos += 1 // stuffed byte
            else throw new IllegalArgumentException(
              f"JPEG decode: unexpected marker ff$next%02x in scan")
          }
          acc = b
          nbits = 8
        }
        nbits -= 1
        (acc >>> nbits) & 1
      }
      def receive(n: Int): Int = {
        var v = 0
        var i = 0
        while (i < n) { v = (v << 1) | bit(); i += 1 }
        v
      }
    }

    private def extend(v: Int, size: Int): Int =
      if (size == 0) 0
      else if (v < (1 << (size - 1))) v - (1 << size) + 1
      else v

    /** Parse a JPEG within the supported profile — BASELINE (SOF0)
      * or PROGRESSIVE (SOF2, spectral selection + successive
      * approximation, the wild corpus's dominant non-baseline form);
      * throws IllegalArgumentException on any malformation or
      * unsupported feature. Progressive accumulates the quantized
      * coefficients across scans (DC first/refine interleaved, AC
      * first/refine per component with EOBn runs and correction bits)
      * and IDCTs once at EOI — a progressive stream carrying the same
      * coefficients as a baseline one decodes BIT-IDENTICALLY.
      * Returns gray (1ch) or interleaved RGB (3ch). */
    def decode(payload: Array[Byte]): JpegImage = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"JPEG decode: $msg")
      if (payload.length < 4 || (payload(0) & 0xff) != 0xff ||
          (payload(1) & 0xff) != 0xd8) fail("bad SOI")
      var pos = 2
      def u16(at: Int): Int = {
        if (at + 1 >= payload.length) fail("truncated")
        ((payload(at) & 0xff) << 8) | (payload(at + 1) & 0xff)
      }
      // a marker segment's declared length, bounds-checked against the
      // actual payload — a truncation mid-segment fails loudly here
      // instead of surfacing as a raw index error
      def seg(at: Int): Int = {
        val len = u16(at)
        if (len < 2 || at + len > payload.length)
          fail("truncated segment")
        len
      }
      val quants = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var width = -1
      var height = -1
      var nComp = 0
      var progressive = false
      var compIds: Array[Int] = null
      var compQuant: Array[Int] = null
      var sampH: Array[Int] = null
      var sampV: Array[Int] = null
      var compDc: Array[Int] = null
      var compAc: Array[Int] = null

      // DHT/DQT parsing shared by the header loop and (progressive)
      // the between-scan loop — tables may be redefined mid-stream
      def readDht(at: Int, len: Int): Unit = {
        var p = at + 2
        while (p < at + len) {
          if (p + 17 > at + len) fail("DHT overrun")
          val tc = (payload(p) & 0xff) >> 4
          val th = payload(p) & 0x0f
          val bits = Array.tabulate(16)(i => payload(p + 1 + i) & 0xff)
          val n = bits.sum
          if (p + 17 + n > at + len) fail("DHT overrun")
          val vals = Array.tabulate(n)(i => payload(p + 17 + i) & 0xff)
          val h = new Huff(bits, vals)
          if (tc == 0) dcTabs(th) = h else acTabs(th) = h
          p += 17 + n
        }
      }
      def readDqt(at: Int, len: Int): Unit = {
        var p = at + 2
        while (p < at + len) {
          if (p + 65 > at + len) fail("DQT overrun")
          if (((payload(p) & 0xff) >> 4) != 0)
            fail("16-bit quant tables unsupported")
          val id = payload(p) & 0x0f
          val q = new Array[Int](64)
          var i = 0
          while (i < 64) {
            q(zigzag(i)) = payload(p + 1 + i) & 0xff
            i += 1
          }
          quants(id) = q
          p += 65
        }
      }

      // one scan header: component list (matched by ID to the SOF
      // order), entropy selectors, spectral band, approximation bits
      final case class ScanInfo(comps: Array[Int], ss: Int, se: Int,
          ah: Int, al: Int, dataStart: Int)
      def parseSos(at: Int, len: Int): ScanInfo = {
        if (len < 3) fail("SOS segment too short")
        val ns = payload(at + 2) & 0xff
        if (len < 2 + 1 + 2 * ns + 3) fail("SOS component table overrun")
        if (ns < 1 || ns > nComp) fail(s"bad scan component count $ns")
        val comps = new Array[Int](ns)
        (0 until ns).foreach { i =>
          val id = payload(at + 3 + 2 * i) & 0xff
          val c = compIds.indexOf(id)
          if (c < 0) fail(s"scan names unknown component id $id")
          comps(i) = c
          val t = payload(at + 4 + 2 * i) & 0xff
          compDc(c) = t >> 4
          compAc(c) = t & 0x0f
        }
        val ss = payload(at + 3 + 2 * ns) & 0xff
        val se = payload(at + 4 + 2 * ns) & 0xff
        val ahal = payload(at + 5 + 2 * ns) & 0xff
        ScanInfo(comps, ss, se, ahal >> 4, ahal & 0x0f, at + len)
      }

      var firstScan: ScanInfo = null
      while (firstScan == null) {
        if (pos + 1 >= payload.length) fail("no SOS before EOF")
        if ((payload(pos) & 0xff) != 0xff) fail("lost marker sync")
        val m = payload(pos + 1) & 0xff
        pos += 2
        m match {
          case 0xd9 => fail("EOI before scan")
          case 0x01 => () // TEM, no payload
          case _ if m >= 0xd0 && m <= 0xd7 => () // RSTn, no payload
          case 0xc0 | 0xc2 =>
            if (width >= 0) fail("duplicate SOF")
            progressive = m == 0xc2
            // every field read below is bounds-checked against the
            // DECLARED length, not just the payload array: a lying
            // header must fail the contract's way, never misparse
            val len = seg(pos)
            if (len < 8) fail("SOF segment too short")
            if ((payload(pos + 2) & 0xff) != 8) fail("not 8-bit")
            height = u16(pos + 3)
            width = u16(pos + 5)
            nComp = payload(pos + 7) & 0xff
            if (nComp != 1 && nComp != 3)
              fail(s"unsupported component count $nComp")
            if (len < 8 + 3 * nComp) fail("SOF component table overrun")
            compIds = new Array[Int](nComp)
            compQuant = new Array[Int](nComp)
            sampH = new Array[Int](nComp)
            sampV = new Array[Int](nComp)
            compDc = new Array[Int](nComp)
            compAc = new Array[Int](nComp)
            (0 until nComp).foreach { c =>
              compIds(c) = payload(pos + 8 + 3 * c) & 0xff
              val samp = payload(pos + 9 + 3 * c) & 0xff
              sampH(c) = samp >> 4
              sampV(c) = samp & 0x0f
              compQuant(c) = payload(pos + 10 + 3 * c) & 0xff
            }
            // supported sampling profiles: a single-component scan is
            // non-interleaved per T.81 (declared factors are inert —
            // common in wild grayscale files); 3 components must be
            // 4:4:4 (all 1x1) or 4:2:0 (luma 2x2, chroma 1x1)
            if (nComp == 1) { sampH(0) = 1; sampV(0) = 1 }
            else {
              val ok444 = sampH.forall(_ == 1) && sampV.forall(_ == 1)
              val ok420 = sampH(0) == 2 && sampV(0) == 2 &&
                (1 until nComp).forall(c => sampH(c) == 1 && sampV(c) == 1)
              if (!ok444 && !ok420)
                fail("sampling unsupported (4:4:4 and 4:2:0 only)")
            }
            pos += len
          case 0xc4 =>
            val len = seg(pos)
            readDht(pos, len)
            pos += len
          case 0xdb =>
            val len = seg(pos)
            readDqt(pos, len)
            pos += len
          case 0xda =>
            if (width < 0) fail("SOS before SOF")
            firstScan = parseSos(pos, seg(pos))
          case 0xc1 => fail("extended sequential unsupported")
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd |
              0xce | 0xcf => fail(f"SOF ff$m%02x unsupported")
          case 0xdd => fail("restart intervals unsupported")
          case _ =>
            pos += seg(pos) // APPn/COM/etc: skip
        }
      }
      if (width <= 0 || height <= 0) fail("missing SOF")
      if (width.toLong * height * nComp > (1L << 30)) fail("too large")
      val hMax = sampH.max
      val vMax = sampV.max
      val mcuCols = (width + 8 * hMax - 1) / (8 * hMax)
      val mcuRows = (height + 8 * vMax - 1) / (8 * vMax)
      // each component's plane at its OWN resolution, block-padded
      val stride = Array.tabulate(nComp)(c => mcuCols * sampH(c) * 8)
      val planes = Array.tabulate(nComp)(c =>
        new Array[Int](stride(c) * mcuRows * sampV(c) * 8))

      if (!progressive) {
        // ---- baseline: one scan, blocks IDCT'd as they decode ----
        val si = firstScan
        if (si.comps.length != nComp) fail("partial scans unsupported")
        if (si.ss != 0 || si.se != 63 || si.ah != 0 || si.al != 0)
          fail("baseline scan must cover the full band")
        (0 until nComp).foreach { c =>
          if (quants(compQuant(c)) == null) fail("missing quant table")
          if (dcTabs(compDc(c)) == null || acTabs(compAc(c)) == null)
            fail("missing huffman table")
        }
        val br = new BitReader(payload, si.dataStart)
        val lastDc = new Array[Int](nComp)

        def decodeBlock(c: Int, blockRow: Int, blockCol: Int): Unit = {
          val zz = new Array[Int](64)
          val dsz = dcTabs(compDc(c)).decode(br)
          if (dsz > 11) fail("bad DC size")
          lastDc(c) += extend(br.receive(dsz), dsz)
          zz(0) = lastDc(c)
          var k = 1
          while (k < 64) {
            val rs = acTabs(compAc(c)).decode(br)
            val run = rs >> 4
            val sz = rs & 0x0f
            if (sz == 0) {
              if (run == 15) k += 16 // ZRL
              else k = 64            // EOB
            } else {
              k += run
              if (k > 63) fail("AC run overflow")
              zz(k) = extend(br.receive(sz), sz)
              k += 1
            }
          }
          val px = dequantIdct(zz, quants(compQuant(c)))
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(c)((blockRow * 8 + yy) * stride(c) +
                blockCol * 8 + xx) = px(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
        }

        // MCU-interleaved entropy decode (T.81 A.2.3) — the exact
        // mirror of the encoder's block order; all factors 1 degrades
        // to the plain per-block interleave
        var my = 0
        while (my < mcuRows) {
          var mx = 0
          while (mx < mcuCols) {
            var c = 0
            while (c < nComp) {
              var v = 0
              while (v < sampV(c)) {
                var hh = 0
                while (hh < sampH(c)) {
                  decodeBlock(c, my * sampV(c) + v, mx * sampH(c) + hh)
                  hh += 1
                }
                v += 1
              }
              c += 1
            }
            mx += 1
          }
          my += 1
        }
      } else {
        // ---- progressive: coefficients accumulate across scans ----
        val gridW = Array.tabulate(nComp)(c => mcuCols * sampH(c))
        val gridH = Array.tabulate(nComp)(c => mcuRows * sampV(c))
        val coef = Array.tabulate(nComp)(c =>
          new Array[Int](gridW(c) * gridH(c) * 64))
        val lastDc = new Array[Int](nComp)

        // component's true dims (the non-interleaved block coverage)
        def compDims(c: Int): (Int, Int) =
          ((width * sampH(c) + hMax - 1) / hMax,
            (height * sampV(c) + vMax - 1) / vMax)

        def decodeScan(si: ScanInfo): Int = {
          if (si.ss == 0 && si.se != 0) fail("DC scan must have Se=0")
          if (si.ss > 0 && si.comps.length != 1)
            fail("AC scans are single-component")
          if (si.se > 63 || (si.ss > 0 && si.ss > si.se))
            fail("bad spectral band")
          if (si.ah != 0 && si.ah != si.al + 1)
            fail("bad successive approximation sequence")
          if (si.al > 13) fail("bad approximation shift")
          si.comps.foreach { c =>
            if (si.ss == 0 && si.ah == 0 && dcTabs(compDc(c)) == null)
              fail("missing huffman table")
            if (si.ss > 0 && acTabs(compAc(c)) == null)
              fail("missing huffman table")
          }
          val br = new BitReader(payload, si.dataStart)
          var eobrun = 0
          java.util.Arrays.fill(lastDc, 0)

          def dcFirst(c: Int, bi: Int): Unit = {
            val dsz = dcTabs(compDc(c)).decode(br)
            if (dsz > 11) fail("bad DC size")
            lastDc(c) += extend(br.receive(dsz), dsz)
            coef(c)(bi) = lastDc(c) << si.al
          }
          def dcRefine(c: Int, bi: Int): Unit =
            if (br.bit() == 1) coef(c)(bi) |= (1 << si.al)

          def acFirst(c: Int, bi: Int): Unit = {
            if (eobrun > 0) { eobrun -= 1; return }
            var k = si.ss
            while (k <= si.se) {
              val rs = acTabs(compAc(c)).decode(br)
              val r = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  // EOBn: 2^r + extra blocks END here, this one included
                  eobrun = (1 << r) - 1 +
                    (if (r > 0) br.receive(r) else 0)
                  k = si.se + 1
                }
              } else {
                k += r
                if (k > si.se) fail("AC run overflow")
                coef(c)(bi + k) = extend(br.receive(s), s) << si.al
                k += 1
              }
            }
          }

          def acRefine(c: Int, bi: Int): Unit = {
            val p1 = 1 << si.al
            // a correction bit may only strengthen a coefficient that
            // does not already carry this scan's bit (G.1.2.3)
            def correct(idx: Int): Unit =
              if (br.bit() == 1 && (coef(c)(idx) & p1) == 0)
                coef(c)(idx) += (if (coef(c)(idx) >= 0) p1 else -p1)
            var k = si.ss
            if (eobrun == 0) {
              var ended = false
              while (!ended && k <= si.se) {
                val rs = acTabs(compAc(c)).decode(br)
                var r = rs >> 4
                val s = rs & 0x0f
                var newval = 0
                if (s != 0) {
                  if (s != 1) fail("refinement magnitude must be 1")
                  newval = if (br.bit() == 1) p1 else -p1
                } else if (r != 15) {
                  eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                  ended = true
                }
                if (!ended) {
                  // advance to the (r+1)-th zero-HISTORY position (or
                  // past 16 for ZRL), refining the nonzero
                  // coefficients passed over on the way
                  var placed = false
                  while (!placed && k <= si.se) {
                    val idx = bi + k
                    if (coef(c)(idx) != 0) correct(idx)
                    else if (r == 0) {
                      if (s != 0) coef(c)(idx) = newval
                      placed = true
                    } else r -= 1
                    k += 1
                  }
                  if (!placed && s != 0)
                    fail("refinement position overflow")
                }
              }
            }
            if (eobrun > 0) {
              // inside an EOB run: only correction bits remain
              while (k <= si.se) {
                val idx = bi + k
                if (coef(c)(idx) != 0) correct(idx)
                k += 1
              }
              eobrun -= 1
            }
          }

          def handle(c: Int, bi: Int): Unit =
            if (si.ss == 0) {
              if (si.ah == 0) dcFirst(c, bi) else dcRefine(c, bi)
            } else {
              if (si.ah == 0) acFirst(c, bi) else acRefine(c, bi)
            }

          if (si.comps.length > 1) {
            // interleaved (DC scans): MCU order over every component
            var my = 0
            while (my < mcuRows) {
              var mx = 0
              while (mx < mcuCols) {
                si.comps.foreach { c =>
                  var v = 0
                  while (v < sampV(c)) {
                    var hh = 0
                    while (hh < sampH(c)) {
                      handle(c, ((my * sampV(c) + v) * gridW(c) +
                        mx * sampH(c) + hh) * 64)
                      hh += 1
                    }
                    v += 1
                  }
                }
                mx += 1
              }
              my += 1
            }
          } else {
            // non-interleaved: the component's own ceil-dims coverage
            val c = si.comps(0)
            val (cw, ch) = compDims(c)
            val bw = (cw + 7) / 8
            val bh = (ch + 7) / 8
            var by = 0
            while (by < bh) {
              var bx = 0
              while (bx < bw) {
                handle(c, (by * gridW(c) + bx) * 64)
                bx += 1
              }
              by += 1
            }
          }
          br.pos
        }

        // the next marker after a scan's entropy data: stuffed ff00
        // pairs belong to leftover entropy, ff fill bytes are legal
        // padding before the marker itself
        def nextMarker(from: Int): Int = {
          var p = from
          while (p + 1 < payload.length) {
            if ((payload(p) & 0xff) == 0xff) {
              val n = payload(p + 1) & 0xff
              if (n == 0x00) p += 2
              else if (n == 0xff) p += 1
              else return p
            } else p += 1
          }
          fail("no marker after scan")
        }

        var cur = nextMarker(decodeScan(firstScan))
        var done = false
        while (!done) {
          if (cur + 1 >= payload.length) fail("no EOI")
          val m = payload(cur + 1) & 0xff
          cur += 2
          m match {
            case 0xd9 => done = true
            case 0x01 => ()
            case _ if m >= 0xd0 && m <= 0xd7 =>
              fail("restart markers unsupported")
            case 0xc4 =>
              val len = seg(cur); readDht(cur, len); cur += len
            case 0xdb =>
              val len = seg(cur); readDqt(cur, len); cur += len
            case 0xda =>
              cur = nextMarker(decodeScan(parseSos(cur, seg(cur))))
            case 0xc0 | 0xc1 | 0xc2 => fail("duplicate SOF")
            case 0xdd => fail("restart intervals unsupported")
            case _ =>
              cur += seg(cur)
          }
        }

        // everything received: dequantize + IDCT every block
        (0 until nComp).foreach { c =>
          if (quants(compQuant(c)) == null) fail("missing quant table")
          val q = quants(compQuant(c))
          var b = 0
          val nBlocks = gridW(c) * gridH(c)
          val zz = new Array[Int](64)
          while (b < nBlocks) {
            System.arraycopy(coef(c), b * 64, zz, 0, 64)
            val px = dequantIdct(zz, q)
            val blockRow = b / gridW(c)
            val blockCol = b % gridW(c)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(c)((blockRow * 8 + yy) * stride(c) +
                  blockCol * 8 + xx) = px(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            b += 1
          }
        }
      }

      // crop the block padding; upsample subsampled chroma by
      // replication (JFIF's permitted nearest upsampling); color-
      // convert if 3 components
      val out = new Array[Byte](width * height * nComp)
      def sample(c: Int, y: Int, x: Int): Int =
        planes(c)((y * sampV(c) / vMax) * stride(c) +
          (x * sampH(c) / hMax))
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          if (nComp == 1)
            out(y * width + x) = sample(0, y, x).toByte
          else {
            val yv = sample(0, y, x).toDouble
            val cb = sample(1, y, x) - 128.0
            val cr = sample(2, y, x) - 128.0
            def clamp(d: Double): Byte =
              math.max(0, math.min(255, math.round(d).toInt)).toByte
            out(3 * (y * width + x)) = clamp(yv + 1.402 * cr)
            out(3 * (y * width + x) + 1) =
              clamp(yv - 0.344136 * cb - 0.714136 * cr)
            out(3 * (y * width + x) + 2) = clamp(yv + 1.772 * cb)
          }
          x += 1
        }
        y += 1
      }
      JpegImage(width, height, nComp, out)
    }
  }

  final case class JpegProgFeatures(media_id: Long,
      width: Option[Int], height: Option[Int], channels: Option[Int],
      bit_identical: Option[Boolean])

  /** Progressive-vs-baseline equivalence at the Spark seam: the same
    * corpus raster encoded BOTH ways (baseline SOF0; progressive SOF2
    * with the full successive-approximation scan script), both decoded
    * through the general decoder, reconstructions compared BYTE FOR
    * BYTE. Progressive is a pure reordering of the same quantized
    * coefficients, so any divergence is a codec bug — the oracle pins
    * `bit_identical` as a literal TRUE per document. Rasters rotate
    * gray / RGB 4:4:4 / RGB 4:2:0 by doc id, so every entropy path
    * (interleaved DC, per-component EOBn AC bands, correction bits,
    * subsampled MCU geometry) runs at corpus scale. Null-not-fail
    * like every media extractor. */
  def extractJpegProgFeatures(spark: SparkSession, documents: DataFrame)
      : Dataset[JpegProgFeatures] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          try {
            val bytes = Option(text).getOrElse("")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val mode = (id % 3).toInt
            val ch = if (mode == 0) 1 else 3
            val w = 8 + (bytes.length % 57)
            val h = math.max(1,
              (bytes.length + ch * w - 1) / (ch * w))
            val padded = java.util.Arrays.copyOf(bytes, w * h * ch)
            java.util.Arrays.fill(padded, bytes.length, w * h * ch,
              ' '.toByte)
            val sub = mode == 2
            val base = JpegCodec.encode(padded, w, h, channels = ch,
              subsample = sub)
            val prog = JpegCodec.encodeProgressive(padded, w, h,
              channels = ch, subsample = sub)
            val db = JpegCodec.decode(base)
            val dp = JpegCodec.decode(prog)
            JpegProgFeatures(id, Some(dp.width), Some(dp.height),
              Some(dp.channels),
              Some(dp.width == db.width && dp.height == db.height &&
                dp.channels == db.channels &&
                java.util.Arrays.equals(dp.pixels, db.pixels)))
          } catch {
            case scala.util.control.NonFatal(_) =>
              JpegProgFeatures(id, None, None, None, None)
          }
        }
      }
  }

  /** Synthesize REAL baseline JPEGs from the corpus on the shared PGM
    * raster geometry — genuinely DCT-coded, quantized, Huffman-packed
    * bytes on the wire. */
  def withJpegPayload(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = 8 + (bytes.length % 57)
        val h = math.max(1, (bytes.length + w - 1) / w)
        val padded = java.util.Arrays.copyOf(bytes, w * h)
        java.util.Arrays.fill(padded, bytes.length, w * h, ' '.toByte)
        (id, JpegCodec.encode(padded, w, h), "image/jpeg")
      }
      .toDF("media_id", "payload", "media_type")
  }

  /** Synthesize REAL 4:2:0 baseline JPEGs from the corpus: each doc's
    * UTF-8 bytes become an interleaved RGB raster whose dims are
    * MULTIPLES OF 16 (w = 16·(1 + n mod 3); h = rows rounded up to
    * 16) — full MCUs and exact 2x2 chroma partitions, so per-channel
    * means survive the subsample within the DC bound and the oracle
    * can recompute them relationally. Space-padded to fill. */
  def withJpeg420Payload(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = bytes.length
        val w = 16 * (1 + n % 3)
        val rows = math.max(1, (n + 3 * w - 1) / (3 * w))
        val h = 16 * ((rows + 15) / 16)
        val padded = java.util.Arrays.copyOf(bytes, w * h * 3)
        java.util.Arrays.fill(padded, n, w * h * 3, ' '.toByte)
        (id, JpegCodec.encode(padded, w, h, channels = 3,
          subsample = true), "image/jpeg")
      }
      .toDF("media_id", "payload", "media_type")
  }

  final case class Jpeg420Features(media_id: Long, width: Option[Int],
      height: Option[Int], channels: Option[Int], r_close: Option[Boolean],
      g_close: Option[Boolean], b_close: Option[Boolean])

  /** Decode + per-channel mean agreement over 4:2:0 JPEG payloads,
    * null-not-fail. Block means depend on DC alone (AC basis functions
    * are zero-sum) and full-MCU geometry makes the chroma box average
    * mean-preserving, so each decoded channel mean sits within a
    * conservative ±6 of the source channel mean (DC quantization ≤1
    * per plane + per-stage rounding, through the ≤1.772-gain color
    * transform). The oracle recomputes source channel means
    * relationally and pins the booleans. */
  def extractJpeg420Features(spark: SparkSession, media: DataFrame)
      : Dataset[Jpeg420Features] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"),
        col("r_mean").cast("double"), col("g_mean").cast("double"),
        col("b_mean").cast("double"))
      .as[(Long, Array[Byte], Double, Double, Double)]
      .mapPartitions { it =>
        it.map { case (id, payload, rm, gm, bm) =>
          try {
            val img = JpegCodec.decode(payload)
            require(img.channels == 3, "expected RGB")
            val sums = new Array[Long](3)
            var i = 0
            while (i < img.pixels.length) {
              sums(i % 3) += img.pixels(i) & 0xff
              i += 1
            }
            val n = img.pixels.length / 3
            def close(sum: Long, src: Double): Boolean =
              math.abs(sum.toDouble / n - src) <= 6.0
            Jpeg420Features(id, Some(img.width), Some(img.height),
              Some(img.channels), Some(close(sums(0), rm)),
              Some(close(sums(1), gm)), Some(close(sums(2), bm)))
          } catch {
            case scala.util.control.NonFatal(_) =>
              Jpeg420Features(id, None, None, None, None, None, None)
          }
        }
      }
  }

  /** Decode + feature extraction over JPEG payloads, null-not-fail.
    * JPEG is LOSSY, so the oracle-checkable facts are the exact
    * header dims plus `mean_close` — whether the decoded mean sits
    * within the DC-quantization error bound (±2) of the source
    * raster mean, recomputed here against the same geometry rule the
    * fixture used. The decoded mean itself rides for inspection. */
  def extractJpegFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[JpegFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"),
        col("source_mean").cast("double"))
      .as[(Long, Array[Byte], Double)]
      .mapPartitions { it =>
        it.map { case (id, payload, srcMean) =>
          try {
            val img = JpegCodec.decode(payload)
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) {
              sum += img.pixels(i) & 0xff
              i += 1
            }
            val mean = sum.toDouble / img.pixels.length
            JpegFeatures(id, payload.length.toLong, Some(img.width),
              Some(img.height), Some(img.channels), Some(mean),
              Some(math.abs(mean - srcMean) <= 2.0))
          } catch {
            // NonFatal, not just IllegalArgumentException: the
            // null-not-fail policy must hold even if a malformation
            // slips past the validators as a raw runtime error — at
            // 100 TB one corrupt payload degrades to a null row,
            // never a dead stage
            case scala.util.control.NonFatal(_) =>
              JpegFeatures(id, payload.length.toLong, None, None, None,
                None, None)
          }
        }
      }
  }

  /** Attach a binary payload column (here: the UTF-8 bytes of `text` —
    * a stand-in for real image bytes) plus media-type metadata. */
  def withBinaryPayload(documents: DataFrame): DataFrame =
    documents.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("media_type"))

  /** Synthesize REAL encoded PGM payloads from the corpus: each doc's
    * UTF-8 bytes become the gray raster of a `(8 + n mod 57)`-wide
    * image (content-varied dimensions so downstream resize planning
    * exercises both branches), space-padded to fill the last row.
    * Deterministic fixture generation — the encode side of the codec
    * seam. */
  def withPgmPayload(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = 8 + (bytes.length % 57)
        val h = math.max(1, (bytes.length + w - 1) / w)
        (id, PgmCodec.encode(bytes, w, h), "image/x-portable-graymap")
      }
      .toDF("media_id", "payload", "media_type")
  }

  /** Synthesize REAL encoded P6 payloads from the corpus: each doc's
    * UTF-8 bytes become the interleaved RGB raster of a
    * `(4 + n mod 23)`-wide image, space-padded to fill. */
  def withPpmPayload(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = 4 + (bytes.length % 23)
        val h = math.max(1, (bytes.length + 3 * w - 1) / (3 * w))
        (id, PpmCodec.encode(bytes, w, h), "image/x-portable-pixmap")
      }
      .toDF("media_id", "payload", "media_type")
  }

  /** Decode + per-CHANNEL feature extraction over P6 payloads, same
    * mapPartitions seam as [[extractFeatures]] but with the
    * null-not-fail policy: a malformed payload yields a row with null
    * decode columns (byte_len + digest still populated) instead of
    * failing the task — at 100 TB a corrupt object in a billion-row
    * media table must degrade to a null, not kill the stage. */
  def extractRgbFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[RgbFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          md.reset()
          val hash = md.digest(payload).map("%02x".format(_)).mkString
          try {
            val img = PpmCodec.decode(payload)
            val sums = new Array[Long](3)
            var i = 0
            while (i < img.pixels.length) {
              sums(i % 3) += img.pixels(i) & 0xff
              i += 1
            }
            val n = img.width.toLong * img.height
            RgbFeatures(id, payload.length.toLong, Some(img.width),
              Some(img.height), Some(img.maxval),
              Some(sums(0).toDouble / n), Some(sums(1).toDouble / n),
              Some(sums(2).toDouble / n), hash)
          } catch {
            case _: IllegalArgumentException =>
              RgbFeatures(id, payload.length.toLong, None, None, None,
                None, None, None, hash)
          }
        }
      }
  }

  /** Decode + feature-extract over binary payloads, batched per
    * partition (codec handle constructed once per partition): a REAL
    * parse of each payload — dimensions and maxval from the header,
    * mean gray level over the raster, content digest. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec/digest init amortized across the batch
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          val img = PgmCodec.decode(payload)
          var sum = 0L
          var i = 0
          while (i < img.pixels.length) {
            sum += img.pixels(i) & 0xff
            i += 1
          }
          md.reset()
          val hash = md.digest(payload).map("%02x".format(_)).mkString
          MediaFeatures(id, payload.length.toLong, img.width, img.height,
            img.maxval, sum.toDouble / (img.width.toLong * img.height),
            hash)
        }
      }
  }

  /** Pure-SQL metadata extraction (no decode): byte length + payload
    * digest — the part of the pipeline that stays codegen'd and
    * oracle-checkable. */
  def payloadMetadata(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      length(col("payload")).as("byte_len"),
      md5(col("payload")).as("payload_md5"),
      col("media_type"))

  /** Resize planning for image-like media: aspect-preserving target
    * dimensions capped at `maxDim` — the metadata half of a resize
    * stage (the pixel work happens in the decode kernel; this computes
    * WHAT to resize to, per row, in pure codegen'd arithmetic). Uses
    * only IEEE divide/multiply/floor so any engine reproduces the
    * outputs bit-for-bit. */
  def resizeDims(features: DataFrame, maxDim: Int): DataFrame = {
    val w = col("width")
    val h = col("height")
    val needs = greatest(w, h) > maxDim
    val scale = lit(maxDim.toDouble) / greatest(w, h).cast("double")
    features.select(col("media_id"), w, h,
      when(needs, floor(w.cast("double") * scale).cast("int"))
        .otherwise(w).as("out_width"),
      when(needs, floor(h.cast("double") * scale).cast("int"))
        .otherwise(h).as("out_height"))
  }

  final case class ResizedFeatures(media_id: Long, width: Int,
      height: Int, out_width: Int, out_height: Int, mean_out: Double,
      out_md5: String)

  /** Nearest-neighbor raster resize — the PIXEL half of the resize
    * stage ([[resizeDims]] plans WHAT to resize to; this does it):
    * out(y, x) = in((y·h) div oh, (x·w) div ow) — pure integer index
    * arithmetic, so any engine (and the DuckDB oracle, positionally
    * over the reconstructed raster string) reproduces the output
    * bytes EXACTLY. The standard cheap decimation for thumbnail/
    * feature pipelines; interpolating kernels layer on the same seam. */
  private[graft] def resizeNearest(pixels: Array[Byte], w: Int, h: Int,
      ow: Int, oh: Int): Array[Byte] = {
    require(w > 0 && h > 0 && ow > 0 && oh > 0, "degenerate dims")
    val out = new Array[Byte](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * w / ow).toInt
        out(y * ow + x) = pixels(sy * w + sx)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Area-average (box-sum) raster resize — the ANTI-ALIASED kernel a
    * training-data image pipeline actually downscales with (nearest
    * decimation drops pixels; area averaging integrates them): the
    * source splits into the floor-partition boxes
    * [y·h div oh, (y+1)·h div oh) × [x·w div ow, (x+1)·w div ow)
    * (clamped to ≥1 px for upscales, where the kernel degrades to
    * nearest) and out(y, x) = the box's pixel sum div its count —
    * pure INTEGER arithmetic end to end, so the oracle recomputes the
    * exact resized bytes positionally, md5 and all. */
  private[graft] def resizeArea(pixels: Array[Byte], w: Int, h: Int,
      ow: Int, oh: Int): Array[Byte] = {
    require(w > 0 && h > 0 && ow > 0 && oh > 0, "degenerate dims")
    val out = new Array[Byte](ow * oh)
    var y = 0
    while (y < oh) {
      val sy0 = (y.toLong * h / oh).toInt
      val sy1 = math.max(sy0 + 1, ((y + 1).toLong * h / oh).toInt)
      var x = 0
      while (x < ow) {
        val sx0 = (x.toLong * w / ow).toInt
        val sx1 = math.max(sx0 + 1, ((x + 1).toLong * w / ow).toInt)
        var sum = 0L
        var sy = sy0
        while (sy < sy1) {
          var sx = sx0
          while (sx < sx1) {
            sum += pixels(sy * w + sx) & 0xff
            sx += 1
          }
          sy += 1
        }
        out(y * ow + x) =
          (sum / ((sy1 - sy0).toLong * (sx1 - sx0))).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode + RESIZE + feature extraction over grayscale PGM payloads:
    * the full pixel pipeline through one mapPartitions seam — parse,
    * aspect-preserving target dims capped at `maxDim` (the identical
    * floor(w·scale) rule as [[resizeDims]], so the two stages can
    * never disagree), decimation by the chosen `kernel` ("nearest" or
    * anti-aliased "area"), then mean + md5 of the RESIZED raster.
    * Every step is integer/IEEE-deterministic, so the resized bytes
    * are oracle arithmetic, not just plumbing. */
  def resizeFeatures(spark: SparkSession, media: DataFrame,
      maxDim: Int, kernel: String = "nearest")
      : Dataset[ResizedFeatures] = {
    require(kernel == "nearest" || kernel == "area",
      s"unknown resize kernel '$kernel'")
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          val img = PgmCodec.decode(payload)
          val needs = math.max(img.width, img.height) > maxDim
          val scale =
            maxDim.toDouble / math.max(img.width, img.height).toDouble
          // clamp to ≥1: a 64x1 banner scaled by 1/4 must stay a row,
          // not vanish
          val ow = if (needs)
            math.max(1, math.floor(img.width.toDouble * scale).toInt)
          else img.width
          val oh = if (needs)
            math.max(1, math.floor(img.height.toDouble * scale).toInt)
          else img.height
          val out =
            if (kernel == "area")
              resizeArea(img.pixels, img.width, img.height, ow, oh)
            else resizeNearest(img.pixels, img.width, img.height,
              ow, oh)
          var sum = 0L
          var i = 0
          while (i < out.length) {
            sum += out(i) & 0xff
            i += 1
          }
          md.reset()
          val digest = md.digest(out).map("%02x".format(_)).mkString
          ResizedFeatures(id, img.width, img.height, ow, oh,
            sum.toDouble / out.length, digest)
        }
      }
  }

  /** Frame sampling for video-like media: emit every `step`-th frame
    * index up to a per-row frame count (derived here from payload size;
    * real media would carry it in metadata). explode(sequence) keeps the
    * generation distributed and codegen'd. */
  def sampleFrames(media: DataFrame, step: Int = 10): DataFrame =
    media
      .select(col("media_id"),
        floor(length(col("payload")).cast("double") / lit(16)).as("n_frames"))
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), greatest(col("n_frames") - 1, lit(0L)),
          lit(step.toLong))).as("frame_idx"))

  final case class WavPcm(sampleRate: Int, samples: Array[Short])

  final case class WavFeatures(media_id: Long, byte_len: Long,
      n_samples: Option[Long], sample_rate: Option[Int],
      mean_amp: Option[Double], rms_amp: Option[Double],
      peak_amp: Option[Int])

  /** Canonical WAVE (RIFF) PCM16 mono codec — the AUDIO format behind
    * the mapPartitions codec seam (third modality after P5 grayscale
    * and P6 RGB), proving the seam's shape — typed decode struct,
    * per-partition init, null-not-fail policy — is format-agnostic.
    * RIFF is a public container: `RIFF <size> WAVE` then chunks, each
    * `<4-byte id> <LE u32 size> <payload>`; `fmt ` carries the PCM
    * parameters, `data` the little-endian 16-bit samples. */
  object WavCodec {
    private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

    /** Serializes raw bytes as the PCM16 sample stream of a mono WAV
      * (space-padding to an even byte count): a deterministic stand-in
      * for real audio, exactly like the P5/P6 payload synthesizers. */
    def encode(data: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      val n = data.length + (data.length & 1)
      val pcm = java.util.Arrays.copyOf(data, n)
      if (data.length < n) pcm(n - 1) = ' '.toByte
      val bb = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(Ascii)).putInt(36 + n)
        .put("WAVE".getBytes(Ascii))
        .put("fmt ".getBytes(Ascii)).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate = sr·block
        .putShort(2).putShort(16) // block align, bits/sample
        .put("data".getBytes(Ascii)).putInt(n).put(pcm)
      bb.array()
    }

    /** Walks the RIFF chunk list (unknown chunks skipped — the spec
      * allows LIST/fact/etc. between fmt and data), requires PCM16
      * mono, and returns the decoded samples; throws
      * IllegalArgumentException on malformed input (callers choose
      * throw-vs-null policy). */
    def decode(payload: Array[Byte]): WavPcm = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"WAV decode: $msg")
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        if (bb.remaining() < 4) fail("truncated tag")
        val b = new Array[Byte](4); bb.get(b); new String(b, Ascii)
      }
      if (tag() != "RIFF") fail("missing RIFF magic")
      if (bb.remaining() < 4) fail("truncated RIFF size")
      bb.getInt() // container size: trust the chunk walk, not this
      if (tag() != "WAVE") fail("not a WAVE container")
      var sampleRate = -1
      var samples: Array[Short] = null
      while (samples == null || sampleRate < 0) {
        if (bb.remaining() < 8) fail("missing fmt/data chunk")
        val id = tag()
        val size = bb.getInt()
        if (size < 0 || size > bb.remaining()) fail(s"bad $id chunk size")
        id match {
          case "fmt " =>
            if (size < 16) fail("fmt chunk too short")
            val start = bb.position()
            val audioFormat = bb.getShort()
            val channels = bb.getShort()
            sampleRate = bb.getInt()
            bb.getInt(); bb.getShort() // byte rate, block align
            val bits = bb.getShort()
            if (audioFormat != 1) fail(s"not PCM: format $audioFormat")
            if (channels != 1) fail(s"not mono: $channels channels")
            if (bits != 16) fail(s"not 16-bit: $bits")
            if (sampleRate <= 0) fail(s"bad sample rate $sampleRate")
            bb.position(start + size + (size & 1))
          case "data" =>
            if ((size & 1) != 0) fail("odd data size for PCM16")
            samples = new Array[Short](size / 2)
            bb.asShortBuffer().get(samples)
            bb.position(bb.position() + size)
          case _ => // skip unknown chunk (word-aligned per RIFF)
            bb.position(bb.position() + size + (size & 1))
        }
      }
      WavPcm(sampleRate, samples)
    }
  }

  /** Synthesize REAL encoded WAV payloads from the corpus: each doc's
    * UTF-8 bytes become the PCM16 sample stream of an 8 kHz mono
    * file. */
  def withWavPayload(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (id, WavCodec.encode(bytes), "audio/wav")
      }
      .toDF("media_id", "payload", "media_type")
  }

  /** Decode + amplitude features over WAV payloads — sample count,
    * mean, RMS (the loudness pair a silence/clipping filter reads),
    * peak |amplitude|. Null-not-fail: a malformed payload yields null
    * decode columns, never a task failure. Sums are exact longs; mean
    * and RMS are each ONE IEEE divide (+ sqrt) at the end. */
  def extractWavFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[WavFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          try {
            val pcm = WavCodec.decode(payload)
            var s = 0L
            var q = 0L
            var peak = 0
            var i = 0
            while (i < pcm.samples.length) {
              val v = pcm.samples(i).toInt
              s += v
              q += v.toLong * v
              if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            val n = pcm.samples.length.toLong
            // a zero-sample file decodes fine but has no amplitude
            // stats — null them rather than emit 0/0 NaNs
            WavFeatures(id, payload.length.toLong, Some(n),
              Some(pcm.sampleRate),
              if (n == 0) None else Some(s.toDouble / n),
              if (n == 0) None else Some(math.sqrt(q.toDouble / n)),
              if (n == 0) None else Some(peak))
          } catch {
            case _: IllegalArgumentException =>
              WavFeatures(id, payload.length.toLong, None, None, None,
                None, None)
          }
        }
      }
  }
}
