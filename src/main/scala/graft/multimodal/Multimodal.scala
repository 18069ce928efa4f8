package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column next to typed
  * metadata, and per-record decode/feature-extraction runs inside
  * `mapPartitions` so each executor core streams its partition through
  * a reusable "decoder" without any driver round-trip.
  *
  * The actual byte decode is a STUB (no image/audio codecs exist in
  * this environment): [[StubCodec]] produces deterministic fake
  * features from the bytes. Everything around it — the schema, the
  * typed Dataset boundary, the partition-wise batch shape, the
  * column contracts — is real and is what a production codec would
  * drop into.
  */
object Multimodal {

  /** A media row: opaque content + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      format: String, // container/codec name, e.g. "png", "wav"
      width: Int,
      height: Int,
      duration_ms: Long,
      content: Array[Byte])

  /** Extracted features per media row. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      frames_sampled: Int,
      features: Array[Float])

  /** STUB decoder: deterministic pseudo-features derived from content
    * bytes. A real implementation decodes pixels/samples here; the
    * call shape (reused per partition, batch-friendly) is the contract.
    */
  object StubCodec extends Serializable {
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // FNV-ish rolling hash over the bytes
      var i = 0
      while (i < content.length) { h = h * 31 + content(i); i += 1 }
      var d = 0
      while (d < dim) {
        val x = h ^ (d.toLong * 0x9e3779b97f4a7c15L)
        val mixed = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
        out(d) = ((mixed >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
        d += 1
      }
      out
    }

    /** STUB frame sampler: treats the content as `frameSize`-byte
      * frames and returns every `stride`-th index (a real video path
      * seeks keyframes).
      */
    def sampleFrameIndices(contentLength: Int, frameSize: Int, stride: Int): Seq[Int] =
      (0 until math.max(contentLength / frameSize, 1) by stride).toSeq
  }

  /** Feature extraction over a media table: one pass, executed as
    * `mapPartitions` so the (stub) codec is reused across a partition's
    * rows — the Scala analogue of a batched pandas UDF.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val frames =
          if (m.media_type == "video")
            StubCodec.sampleFrameIndices(m.content.length, frameSize = 256, stride = 2).size
          else 1
        MediaFeatures(m.media_id, m.media_type, m.content.length.toLong, frames,
          StubCodec.features(m.content, dim))
      }
    }
  }

  /** STUB resize: recomputes the metadata exactly as a real resize
    * would and re-derives (fake) content deterministically — the
    * Dataset-level shape (typed map, metadata contract, content
    * replaced) is what a production implementation drops into.
    */
  def resize(media: Dataset[MediaRecord], width: Int, height: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        // STUB: real codec decodes + rescales pixels; the fake keeps the
        // bytes deterministic per (content, target size)
        val fake = StubCodec.features(m.content, dim = 8).flatMap { f =>
          java.nio.ByteBuffer.allocate(4).putFloat(f).array()
        }
        m.copy(width = width, height = height, content = fake)
      }
    }
  }

  /** Synthesize a media table from the documents testdata (bytes from
    * text) so the plumbing is exercisable without real codecs. Media
    * type/format derive deterministically from the id.
    */
  def syntheticMediaFromDocs(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        (col("n_chars") * 40).cast("long").as("duration_ms"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }
}
