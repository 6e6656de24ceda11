package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata.
  *
  * The Spark-side plumbing — schema, typed Encoders, partition-batched
  * processing, frame-offset explosion — is real and tested. Image
  * payloads whose magic bytes identify a PNG/JPEG/BMP/GIF are decoded
  * for real via `javax.imageio` (JDK-built-in, headless-safe):
  * `width`/`height` are the true pixel dimensions and `decoded=true`.
  * Anything else — audio, video, or synthetic fixture bytes — falls
  * back to the deterministic stub (dims derived from byte length,
  * `decoded=false`), which keeps the fixtures oracle-checkable while
  * real image bytes get real answers. Audio/video decoding would slot
  * into the same [[MediaFeatures.of]] body; every plan shape stays
  * identical.
  *
  * Scale: payloads stay in columnar parquet; `mapPartitions` processes
  * one partition's batch per task with no shuffle; feature extraction
  * is map-only. Frame sampling explodes to (media, offset) rows which
  * downstream group back by media_id — the standard video-pipeline
  * layout.
  */
object Multimodal {

  /** One media row: the opaque payload plus typed metadata. */
  case class MediaRow(media_id: Long, media_type: String,
      payload: Array[Byte], source: String, length_hint: Long)

  /** Decoded features: real pixel dims when the payload is a decodable
    * image (`decoded=true`), deterministic byte-derived stand-ins
    * otherwise (`decoded=false`).
    */
  case class MediaFeatures(media_id: Long, media_type: String,
      n_bytes: Long, sig: String, width: Int, height: Int,
      decoded: Boolean)

  object MediaFeatures {
    // ImageIO's default cache spills decode buffers to temp FILES —
    // per-row disk IO inside an executor task; decode in memory
    javax.imageio.ImageIO.setUseCache(false)

    /** Magic-byte sniff — only payloads that can possibly be an image
      * reach ImageIO (whose SPI scan is not free per row): PNG, JPEG,
      * BMP, GIF.
      */
    private def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 8 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
        (b(0) == 'B' && b(1) == 'M') ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))

    def of(r: MediaRow): MediaFeatures = {
      // a null payload (null source text cast to binary) decodes as
      // empty media — one bad row must not NPE the whole partition
      val bytes =
        if (r.payload == null) Array.emptyByteArray else r.payload
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      // real decode path: a corrupt-but-magic-matching payload must
      // yield the fallback features, not kill the partition
      val img =
        if (looksLikeImage(bytes))
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        else None
      img match {
        case Some(i) =>
          MediaFeatures(r.media_id, r.media_type, bytes.length.toLong,
            hex.substring(0, 8), width = i.getWidth,
            height = i.getHeight, decoded = true)
        case None =>
          MediaFeatures(r.media_id, r.media_type, bytes.length.toLong,
            hex.substring(0, 8),
            width = (bytes.length % 640).toInt,
            height = (bytes.length % 480).toInt, decoded = false)
      }
    }
  }

  /** Build a media table from `documents` (text bytes stand in for the
    * opaque payload; media_type assigned round-robin for plumbing
    * tests).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      col("source"), col("n_chars").as("length_hint"))

  /** Decode / feature-extract over partition batches — the
    * `mapPartitions` seam where a real decoder (and its per-partition
    * init cost: model load, codec context) would live.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec/model handles)
      rows.map(MediaFeatures.of)
    }
  }

  /** Resized media row: payload downsampled, dimensions halved. */
  case class ResizedMedia(media_id: Long, media_type: String,
      n_bytes_in: Long, n_bytes_out: Long, sig_out: String)

  /** Resize / downsample over partition batches. STUB decode (see
    * object docs): a real implementation would decode, scale, and
    * re-encode; the deterministic fake keeps every `stride`-th byte,
    * which preserves the real pipeline shape — map-only, payload in /
    * smaller payload out, per-partition codec init amortized across
    * the batch.
    */
  def resize(media: DataFrame, stride: Int): Dataset[ResizedMedia] = {
    require(stride > 0, "stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (scaler/codec handles)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val in = if (r.payload == null) Array.emptyByteArray else r.payload
        // pre-sized stepped copy: this is the per-byte hot path, no
        // boxing or per-index guard evaluation
        val out = new Array[Byte]((in.length + stride - 1) / stride)
        var i = 0
        var o = 0
        while (i < in.length) { out(o) = in(i); o += 1; i += stride }
        md.reset()
        val hex = md.digest(out).map("%02x".format(_)).mkString
        ResizedMedia(r.media_id, r.media_type, in.length.toLong,
          out.length.toLong, hex.substring(0, 8))
      }
    }
  }

  /** Frame sampling for "video" rows: one row per sampled frame offset
    * (every `step` units of the length hint) — pure explode, no UDF.
    */
  def sampleFrames(media: DataFrame, step: Int): DataFrame = {
    require(step > 0, "step must be positive")
    media.filter(col("media_type") === "video" && col("length_hint") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("length_hint") - 1,
          lit(step.toLong))).as("frame_offset"))
  }
}
