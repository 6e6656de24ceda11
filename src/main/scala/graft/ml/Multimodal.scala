package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata.
  *
  * The Spark-side plumbing — schema, typed Encoders, partition-batched
  * processing, frame-offset explosion — is real and tested. The actual
  * media decode is STUBBED with a deterministic fake (this container
  * has no image/audio libraries): `decodeStub` derives pseudo-features
  * from the bytes (length + md5 prefix). Swapping in a real decoder
  * means replacing only the body of [[MediaFeatures.of]]; every plan
  * shape stays identical.
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

  /** Stubbed decoded features — deterministic fake (see object docs). */
  case class MediaFeatures(media_id: Long, media_type: String,
      n_bytes: Long, sig: String, fake_width: Int, fake_height: Int)

  object MediaFeatures {
    /** STUB: a real implementation would decode the media here. The
      * fake is pure and deterministic so it is testable and
      * oracle-checkable (sig = first 8 hex chars of md5(payload)).
      */
    def of(r: MediaRow): MediaFeatures = {
      // a null payload (null source text cast to binary) decodes as
      // empty media — one bad row must not NPE the whole partition
      val bytes =
        if (r.payload == null) Array.emptyByteArray else r.payload
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      MediaFeatures(r.media_id, r.media_type, bytes.length.toLong,
        hex.substring(0, 8),
        fake_width = (bytes.length % 640).toInt,
        fake_height = (bytes.length % 480).toInt)
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
