package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The actual codecs are NOT in this container, so the decode kernel is a
  * clearly-marked deterministic STUB (see `FakeDecoder`) — what is real
  * and tested is the Spark-side shape of the operator: schema, batch
  * iteration (`mapPartitions` so a JNI/codec handle is amortized per
  * partition, the Scala analogue of `mapInPandas` batches), partitioning,
  * and the explode-based frame sampler.
  *
  * Scale: payloads never shuffle — metadata extraction and frame-index
  * generation are per-row; any groupBy happens on the small extracted
  * feature columns only.
  */
object Multimodal {

  final case class MediaFeatures(media_id: Long, byte_len: Long,
      width: Int, height: Int, feature_hash: String)

  /** STUB decoder: a real build links an image/audio codec here. The fake
    * derives deterministic pseudo-features from the bytes so the plumbing
    * is end-to-end testable. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, String) = {
      // ??? real codec goes here; deterministic fake below
      val len = payload.length
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString
      val width = 64 + (java.lang.Long.parseLong(h.take(4), 16) % 1024L).toInt
      val height = 64 + (java.lang.Long.parseLong(h.slice(4, 8), 16) % 1024L).toInt
      (width, height, h)
    }
  }

  /** Attach a binary payload column (here: the UTF-8 bytes of `text` —
    * a stand-in for real image bytes) plus media-type metadata. */
  def withBinaryPayload(documents: DataFrame): DataFrame =
    documents.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("image/fake").as("media_type"))

  /** Decode + feature-extract over binary payloads, batched per
    * partition (codec handle constructed once per partition). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would happen here
        it.map { case (id, payload) =>
          val (w, h, hash) = FakeDecoder.decode(payload)
          MediaFeatures(id, payload.length.toLong, w, h, hash)
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
