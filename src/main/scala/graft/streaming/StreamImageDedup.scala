package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.multimodal.Multimodal

/** Streaming perceptual image deduplication: the stream analogue of
  * [[Multimodal.imageDHash]] + exact-dhash grouping, for continuous
  * crawl ingestion. Each micro-batch decodes its payloads per partition
  * (stateless — the codec work is a map), then the first arrival of
  * each dHash within the watermark horizon is kept;
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
    dhashEvents(stream, hashW, hashH, maxPixels)
      .withColumn("__k",
        when(col("cause") === "ok" && col("dhash").isNotNull,
          concat(lit("h:"), col("dhash")))
          .otherwise(concat(lit("u:"), col("media_id"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__k")
      .drop("__k")
}
