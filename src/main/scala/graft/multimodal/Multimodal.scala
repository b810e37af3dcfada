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
