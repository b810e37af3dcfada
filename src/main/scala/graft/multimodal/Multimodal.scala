package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED (this container has no image/audio
  * codecs): [[MediaDecoder.decodeStub]] derives deterministic fake
  * features from the bytes. Everything around it — the schema, the
  * partition-batched `mapPartitions` shape (one decoder instance per
  * partition, streamed batches, no per-row setup cost), partitioning
  * by media type, and the metadata projection — is the real
  * cluster-scale plumbing a production decoder drops into.
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte]
  )

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,     // stub-decoded
      height: Int,    // stub-decoded
      duration_ms: Long, // stub-decoded (audio/video)
      checksum: Long
  )

  /** Wrap any table into media rows by treating a string column as
    * the payload bytes (deterministic stand-in for real blobs).
    */
  def synthesize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")
      ).as("media_type"),
      col(textCol).cast("binary").as("payload"))

  /** Batched per-partition decode. A real implementation would open
    * one codec per partition here and decode `batch`-sized chunks;
    * the stub keeps the identical dataflow shape.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder setup happens once, here
      val decoder = MediaDecoder
      rows.grouped(64).flatMap { batch =>   // batch shape for vectorized codecs
        batch.iterator.map(decoder.decodeStub)
      }
    }
  }
}

object MultimodalFrames {
  import Multimodal.MediaRow

  /** One sampled frame/clip from a media payload. */
  final case class FrameRow(
      media_id: Long,
      frame_idx: Int,
      offset_bytes: Long,
      frame: Array[Byte] // stub: raw byte window; real: decoded frame
  )

  /** Frame sampling: every `stride`-th fixed-size window of the
    * payload becomes a frame row. The explode shape (one media row →
    * many frame rows, flatMap inside mapPartitions) is exactly how a
    * real video decoder fans out; only the byte-window "decode" is
    * stubbed. Downstream ops (per-frame featurization, dedup,
    * similarity) consume `FrameRow` unchanged.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameSize: Int = 64, stride: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { m =>
        val n = math.max(m.payload.length / frameSize, 0)
        (0 until n by stride).iterator.map { i =>
          FrameRow(
            media_id = m.media_id,
            frame_idx = i,
            offset_bytes = i.toLong * frameSize,
            frame = java.util.Arrays.copyOfRange(
              m.payload, i * frameSize,
              math.min((i + 1) * frameSize, m.payload.length)))
        }
      }
    }
  }

  /** Resize plumbing: maps each frame through a (stubbed) resampler
    * to a fixed target size — the real version swaps the byte-fold
    * for an image scaler; schema and batching are identical.
    */
  def resizeFrames(spark: SparkSession, frames: Dataset[FrameRow],
                   targetBytes: Int): Dataset[FrameRow] = {
    import spark.implicits._
    frames.mapPartitions { it =>
      it.map { f =>
        val out = new Array[Byte](targetBytes)
        var i = 0
        while (i < f.frame.length) { // stub "resample": fold bytes
          out(i % targetBytes) = (out(i % targetBytes) + f.frame(i)).toByte
          i += 1
        }
        f.copy(frame = out)
      }
    }
  }
}

/** STUB decoder — deterministic fake features derived from payload
  * bytes. Replace `decodeStub` with a real codec (e.g. javacv /
  * TwelveMonkeys) bound per partition; signatures stay identical.
  */
object MediaDecoder {
  import Multimodal._

  def decodeStub(row: MediaRow): MediaFeatures = {
    val len = row.payload.length.toLong
    // deterministic pseudo-features, stable across runs and engines
    val sum = {
      var s = 0L
      var i = 0
      while (i < row.payload.length) { s += (row.payload(i) & 0xff).toLong; i += 1 }
      s
    }
    MediaFeatures(
      media_id = row.media_id,
      media_type = row.media_type,
      byte_len = len,
      width = (len % 640).toInt,
      height = ((len * 7) % 480).toInt,
      duration_ms = if (row.media_type == "image") 0L else (sum % 600000L),
      checksum = sum
    )
  }
}
