package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.multimodal.Multimodal

/** Streaming perceptual media deduplication: the stream analogue of
  * [[Multimodal.imageDHash]] / [[Multimodal.videoDHash]] /
  * [[Multimodal.audioDHash]] + exact-hash grouping, for continuous
  * crawl ingestion. Each micro-batch decodes its payloads per partition
  * (stateless — the codec work is a map), then the first arrival of
  * each perceptual hash within the watermark horizon is kept;
  * `dropDuplicatesWithinWatermark` bounds the keeper state exactly as
  * [[StreamDedup]] does for text content hashes. A dHash collision is
  * CONTENT identity at the perceptual level — re-encoded and
  * brightness-shifted copies of an image dedup here even though every
  * byte-level key (payload md5, pixel CRC) differs.
  *
  * Undecodable rows (`cause != "ok"`) are NOT deduped against each
  * other: a routing cause is not content identity, so their state key
  * falls back to the media id (unique — they always pass through,
  * carrying their cause for the reject plane to count downstream).
  *
  * Near-dup PAIRING (hamming > 0) on a stream stays with the batch
  * pass over the store ([[graft.operators.dedup.Dedup.hammingPairs]]
  * merge-on-read — the [[StreamDedup]] re-appearance discipline):
  * within-watermark exact-dhash collapse removes the overwhelming
  * duplicate mass cheaply, and the store pass owns the ≤-maxHamming
  * tail.
  */
object StreamImageDedup {

  /** A timestamped media event — [[Multimodal.MediaRow]] plus the
    * event time a watermark needs.
    */
  final case class MediaEvent(
      media_id: Long,
      ts: java.sql.Timestamp,
      payload: Array[Byte],
      source: String)

  /** A hashed media event: decode outcome + the carried event fields. */
  final case class HashedMediaEvent(
      media_id: Long,
      ts: java.sql.Timestamp,
      cause: String,
      dhash: Option[Long],
      source: String)

  /** Per-partition decode + dHash, carrying event time through — works
    * identically on a static or streaming Dataset (no state).
    */
  def dhashEvents(stream: Dataset[MediaEvent], hashW: Int = 8,
      hashH: Int = 8,
      maxPixels: Long = 64L * 1024 * 1024): Dataset[HashedMediaEvent] = {
    import stream.sparkSession.implicits._
    stream.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val (cause, _, _, bits) =
          Multimodal.dhashOne(r.payload, hashW, hashH, maxPixels)
        HashedMediaEvent(r.media_id, r.ts, cause, bits, r.source)
      }
    }
  }

  /** Keep the first arrival of each perceptual hash within the
    * watermark window; undecodable rows pass through (unique fallback
    * key). Output columns: media_id, ts, cause, dhash, source.
    */
  def dhashWithinWatermark(stream: Dataset[MediaEvent],
      watermark: String = "10 minutes", hashW: Int = 8, hashH: Int = 8,
      maxPixels: Long = 64L * 1024 * 1024): DataFrame =
    firstArrival(dhashEvents(stream, hashW, hashH, maxPixels), watermark)

  /** Per-partition clip hash for VIDEO events — [[Multimodal
    * .videoDHash]]'s container walk + per-frame dHash + majority vote,
    * carried through the same [[HashedMediaEvent]] shape (`dhash` =
    * `clip_dhash`).
    */
  def videoDHashEvents(stream: Dataset[MediaEvent], hashW: Int = 8,
      hashH: Int = 8, stride: Int = 1, maxSampledFrames: Int = 32,
      maxPixels: Long = 64L * 1024 * 1024): Dataset[HashedMediaEvent] = {
    import stream.sparkSession.implicits._
    stream.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val vh = Multimodal.clipDHashOne(
          Multimodal.MediaRow(r.media_id, "video", r.payload, r.source),
          hashW, hashH, stride, maxSampledFrames, maxPixels)
        HashedMediaEvent(r.media_id, r.ts, vh.cause, vh.clip_dhash, r.source)
      }
    }
  }

  /** Per-partition envelope hash for AUDIO events — [[Multimodal
    * .audioDHash]]'s PCM decode + energy-window difference hash.
    */
  def audioDHashEvents(stream: Dataset[MediaEvent], bits: Int = 64,
      maxFrames: Long = 1L << 32): Dataset[HashedMediaEvent] = {
    import stream.sparkSession.implicits._
    stream.mapPartitions { rows =>
      rows.map { r =>
        val ah = Multimodal.audioDHashOne(
          Multimodal.MediaRow(r.media_id, "audio", r.payload, r.source),
          bits, maxFrames)
        HashedMediaEvent(r.media_id, r.ts, ah.cause, ah.dhash, r.source)
      }
    }
  }

  /** [[dhashWithinWatermark]] for video clips: first arrival of each
    * majority clip fingerprint within the watermark horizon.
    */
  def videoWithinWatermark(stream: Dataset[MediaEvent],
      watermark: String = "10 minutes", hashW: Int = 8, hashH: Int = 8,
      stride: Int = 1, maxSampledFrames: Int = 32,
      maxPixels: Long = 64L * 1024 * 1024): DataFrame =
    firstArrival(videoDHashEvents(stream, hashW, hashH, stride,
      maxSampledFrames, maxPixels), watermark)

  /** [[dhashWithinWatermark]] for audio clips: first arrival of each
    * energy-envelope fingerprint within the watermark horizon.
    */
  def audioWithinWatermark(stream: Dataset[MediaEvent],
      watermark: String = "10 minutes", bits: Int = 64,
      maxFrames: Long = 1L << 32): DataFrame =
    firstArrival(audioDHashEvents(stream, bits, maxFrames), watermark)

  // the shared stateful tail: key by the perceptual hash when one
  // exists (content identity), by the media id otherwise (pass-through)
  private def firstArrival(hashed: Dataset[HashedMediaEvent],
      watermark: String): DataFrame =
    hashed
      .withColumn("__k",
        when(col("cause") === "ok" && col("dhash").isNotNull,
          concat(lit("h:"), col("dhash")))
          .otherwise(concat(lit("u:"), col("media_id"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__k")
      .drop("__k")
}
