package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analogue of `mapInPandas`: an iterator→iterator
  * `mapPartitions` so a real decoder could hold one codec per partition,
  * not one per row).
  *
  * The actual byte decode is STUBBED (no image/audio libs in this build):
  * [[StubDecoder]] derives deterministic fake features from the bytes. The
  * Spark-side plumbing — schema, partitioning, batch shape, frame
  * sampling — is real and tested; swapping in a true decoder changes only
  * the function body.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  /** Features a decoder emits; deterministic stub values here. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      checksum: String,
      width: Int, // stub: derived from payload bytes
      height: Int,
      n_frames: Int)

  /** The stub "decoder": replace with a real codec binding. Deterministic
    * pure function of the payload so tests and oracles can replicate it.
    */
  object StubDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val len = r.payload.length.toLong
      val b0 = if (len > 0) r.payload(0) & 0xff else 0
      val b1 = if (len > 1) r.payload(1) & 0xff else 0
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        byte_len = len,
        checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(r.payload).map("%02x".format(_)).mkString,
        width = 16 + b0 % 64 * 16,
        height = 16 + b1 % 64 * 16,
        n_frames = if (r.kind == "video") (len % 240 + 1).toInt else 1)
    }
  }

  /** Batch decode: one decoder instance per partition, iterator-in /
    * iterator-out (constant memory; the mapInPandas shape).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real implementation would initialize the codec here, once
      rows.map(StubDecoder.decode)
    }
  }

  /** Frame sampling for video-ish payloads: every `stride`-th chunk of
    * `frameBytes` becomes one frame row (media_id, frame_idx, frame bytes).
    * A payload shorter than one frame still yields its single partial
    * frame (a sub-frame clip is still a sample); only EMPTY payloads
    * yield no rows (an empty "frame" would be pure noise downstream).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    val df = media.toDF().where(length(col("payload")) > 0)
    df.select(col("media_id"),
      explode(transform(
        sequence(lit(0), greatest(
          (length(col("payload")) / frameBytes / stride).cast("int") - 1, lit(0))),
        i => struct((i * stride).as("frame_idx"),
          substring(col("payload"), i * stride * frameBytes + 1, lit(frameBytes))
            .as("frame")))).as("f"))
      .select(col("media_id"), col("f.frame_idx"), col("f.frame"))
  }

  /** A resized ("thumbnail") media row. */
  final case class MediaThumb(media_id: Long, kind: String,
      thumb: Array[Byte])

  /** Resize plumbing: deterministic stub "scaler" — the thumbnail is
    * `targetBytes` evenly-spaced bytes of the payload (payloads already
    * at or under the target pass through). A real implementation swaps
    * the per-row function for an image scaler; the batch shape
    * (iterator→iterator per partition, codec initialized once) and the
    * output schema are what this exercises.
    */
  def resizeStub(media: Dataset[MediaRow],
      targetBytes: Int = 32): Dataset[MediaThumb] = {
    require(targetBytes > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real implementation would initialize the scaler here, once
      rows.map { r =>
        val n = r.payload.length
        val t =
          if (n <= targetBytes) r.payload
          else Array.tabulate(targetBytes)(i =>
            r.payload((i.toLong * n / targetBytes).toInt))
        MediaThumb(r.media_id, r.kind, t)
      }
    }
  }

  /** Build a media dataset from the documents table (text bytes play the
    * payload) — the driver-facing fixture for the multimodal plumbing.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source")).as[MediaRow]
  }
}
