package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support for training-data pipelines (builder-prompt
  * north star): image/audio/video as opaque `binary` columns with typed
  * metadata, processed in per-partition batches.
  *
  * Decoding: REAL pure-JVM codecs — 24-bit BMP and PCM16 WAV ([[Codecs]],
  * round-trip-tested) plus PNG/JPEG/GIF through the JDK's own
  * `javax.imageio` — dispatched by mime through [[Codecs.decodeAny]].
  * Only formats with no JDK decoder (MP3, video) fall back to
  * [[DecodeStub]], a deterministic fake documented as such.
  * Everything else is real and tested: the schema, the partition-local
  * batch processing shape (mapPartitions — the Scala analog of
  * mapInPandas batching: one iterator per partition, no per-row setup
  * cost), the feature extraction, and the metadata algebra.
  *
  * Scale notes: payloads never shuffle — every transform here is
  * partition-local (mapPartitions / scalar expressions); only the small
  * extracted features flow into joins/aggregates downstream. At 100 TB
  * the payload column stays in parquet until the scan, and column pruning
  * drops it entirely for metadata-only queries.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(
      width: Int, height: Int, sampleRate: Int, nFrames: Int, mime: String)

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long, kind: String, dim: Int, features: Array[Double])

  /** STUB decoder — deterministic fake in place of a real codec.
    * A production build replaces `decode` with e.g. an imageio/ffmpeg
    * call; the signature (bytes + meta in, fixed-size buffer out) is the
    * real contract.
    */
  object DecodeStub {
    /** "Decode" payload bytes into nFrames × (width×height) fake samples:
      * sample(f, p) = byte[(f·31 + p·7) mod len] — deterministic, cheap,
      * and shaped exactly like a real decoded buffer.
      */
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Array[Double]] = {
      val pixels = math.max(1, meta.width * meta.height)
      val frames = math.max(1, meta.nFrames)
      val len = math.max(1, payload.length)
      Array.tabulate(frames, pixels) { (f, p) =>
        (payload(((f * 31 + p * 7) % len + len) % len) & 0xff) / 255.0
      }
    }
  }

  /** Build a deterministic synthetic media table from the documents corpus
    * (text bytes as payload) — the test fixture for the plumbing.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val payload = text.getBytes("UTF-8")
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val meta = kind match {
        case "image" => MediaMeta(8, 8, 0, 1, "image/fake")
        case "audio" => MediaMeta(1, 1, 16000, payload.length, "audio/fake")
        case _       => MediaMeta(4, 4, 0, 1 + (payload.length % 7), "video/fake")
      }
      MediaRow(id, kind, payload, meta)
    }
  }

  /** Feature extraction in partition-local batches: decode (real codec
    * where the format allows, stub fallback — [[Codecs.decodeAny]]) then
    * a 16-bin normalized intensity histogram per media item.
    * mapPartitions keeps one decoder instantiation per partition — the
    * batch shape a real codec needs.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // Per-partition (per-batch) setup happens here, once.
      rows.map { m =>
        val decoded = Codecs.decodeAny(m.payload, m.meta)
        val hist = new Array[Double](16)
        var n = 0
        decoded.foreach(_.foreach { v =>
          hist(math.min(15, (v * 16).toInt)) += 1.0; n += 1
        })
        if (n > 0) { var i = 0; while (i < 16) { hist(i) /= n; i += 1 } }
        MediaFeatures(m.media_id, m.kind, 16, hist)
      }
    }
  }

  /** Metadata-only resize: the payload is untouched (re-encode is part of
    * the decode stub's future contract); target dims recorded in meta.
    */
  def resize(spark: SparkSession, media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.map(m => m.copy(meta = m.meta.copy(width = w, height = h)))
  }

  /** Deterministic frame sampling for video rows: keep every `stride`-th
    * frame index; non-video rows pass through unchanged.
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { m =>
      if (m.kind == "video") {
        val kept = math.max(1, (m.meta.nFrames + stride - 1) / stride)
        m.copy(meta = m.meta.copy(nFrames = kept))
      } else m
    }
  }
}
