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
}
