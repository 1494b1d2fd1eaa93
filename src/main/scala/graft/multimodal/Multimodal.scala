package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` with typed
  * metadata, decode/feature-extract as a per-partition batch stage.
  *
  * The container has no image/audio codecs, so [[FakeDecoder]] is a
  * clearly-marked deterministic stand-in (its outputs are pure
  * functions of the byte length + content hash); everything around
  * it — schema, Dataset plumbing, partition batching, feature
  * columns — is the real shape a decoder plugs into. A real decoder
  * implements [[Decoder.decode]]; nothing else changes.
  */
final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Long,
    height: Long, n_frames: Long, content_hash: String)

trait Decoder extends Serializable {
  def decode(media: Array[Byte], mime: String): (Long, Long, Long)
}

/** Deterministic fake: width/height/frames derived from byte count
  * — SQL-expressible, so the full mapPartitions path is verified
  * against the DuckDB oracle (mm_binary_features).
  */
object FakeDecoder extends Decoder {
  override def decode(media: Array[Byte], mime: String): (Long, Long, Long) = {
    val n = media.length.toLong
    (64 + (n * 7) % 513, 64 + (n * 13) % 513, 1 + n % 30)
  }
}

object Multimodal {
  /** Derive a media table from documents: text bytes as the opaque
    * binary payload (stands in for image/audio blobs). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
  }

  /** Feature extraction: one decoder instance per partition (the
    * expensive-init pattern for real codecs), rows streamed. */
  def extractFeatures(media: Dataset[MediaRow], decoder: Decoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { r =>
        val (w, h, f) = decoder.decode(r.media, r.mime)
        md.reset()
        val hash = md.digest(r.media).map("%02x".format(_)).mkString.take(16)
        MediaFeatures(r.doc_id, r.media.length.toLong, w, h, f, hash)
      }
    }
  }

  def binaryFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir), FakeDecoder)
      .toDF().orderBy(col("doc_id"))

  /** Frame sampling + resize metadata: up to `maxFrames` frames per
    * media row, each with a content-derived hash, plus the
    * aspect-preserving resize dims for a 224-wide target. Streams
    * per-partition like [[extractFeatures]]; a real codec replaces
    * the hash with pixel extraction, nothing else changes.
    */
  final case class FrameRow(doc_id: Long, n_frames: Long, frame_idx: Long,
      frame_hash: String, resized_w: Long, resized_h: Long)

  def frameSample(media: Dataset[MediaRow], decoder: Decoder,
      maxFrames: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val (w, h, f) = decoder.decode(r.media, r.mime)
        val rw = 224L
        val rh = h * 224L / w // integer division, like the oracle's //
        (0L until math.min(f, maxFrames.toLong)).iterator.map { i =>
          md.reset()
          val hash = md.digest(r.media ++ s"#$i".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          FrameRow(r.doc_id, f, i, hash, rw, rh)
        }
      }
    }
  }

  def frameFeatures(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(mediaTable(spark, sfDir), FakeDecoder, 3)
      .toDF().orderBy(col("doc_id"), col("frame_idx"))
}
