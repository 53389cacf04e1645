package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType,
  StructField, StructType}

import graft.operators.multimodal.Multimodal

/** Streaming keyframe sink: the `foreachBatch` writer for
  * [[Multimodal.videoKeyframes]] thumbnails under the commit-marker
  * discipline every other durable sink uses
  * ([[graft.store.DurableStore]]) — at-least-once replays append each
  * batch's thumbnails exactly once. `videoKeyframes` is stateless per
  * clip (one decode pass, shot boundaries against the previous sampled
  * frame only), so the sink is pure plumbing: decode + boundary-detect
  * the micro-batch, append one row per keyframe.
  *
  * Table: `keyframes` (media_id, frame_idx, width, height, thumb_png,
  * batch). Only `ok` rows land — a crawl counts decode failures from
  * the decode plane, not from its thumbnail store. Same ID CONTRACT as
  * the stores: media ids are unique across the SINK; a re-crawled id in
  * a later batch appends nothing (first write wins), which also makes
  * the landed-append + uncommitted-marker crash window replay-safe (the
  * [[graft.operators.dedup.ReleaseStore]] dedupAppend discipline, keyed
  * by media_id).
  */
final class KeyframeSink(protected val spark: SparkSession,
    protected val path: String, minHamming: Int = 16,
    targetW: Int = 256, targetH: Int = 256)
    extends graft.store.DurableStore {

  private val schema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("thumb_png", BinaryType),
    StructField("batch", LongType)))

  /** The accumulated keyframe thumbnails — explicit schema so a sink
    * whose only appends were all-empty frames still reads, and a
    * never-written sink reads as a literal empty frame (a monitoring
    * read before the first micro-batch is legal).
    */
  def thumbnails: DataFrame = {
    recoverTable("keyframes")
    if (!fs.exists(hPath(s"$path/keyframes")))
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    else spark.read.schema(schema).parquet(s"$path/keyframes")
  }

  /** Append one micro-batch's keyframes exactly-once under `batchId`. */
  def writeBatch(media: Dataset[Multimodal.MediaRow],
      batchId: Option[Long] = None): Unit = writeLock.synchronized {
    recoverTable("keyframes")
    markers.guarded("keyframes", batchId) {
      // in-batch id dedup FIRST: a micro-batch can carry the same
      // media_id twice (re-crawl inside one trigger interval), and the
      // stored-side anti-join below can't see rows that aren't stored
      // yet — without this, both copies' keyframes would land
      val kf = Multimodal
        .videoKeyframes(media.dropDuplicates("media_id"),
          minHamming, targetW, targetH)
        .filter(col("cause") === "ok")
        .select(col("media_id"), col("frame_idx"), col("width"),
          col("height"), col("thumb_png"))
      val fresh =
        if (fs.exists(hPath(s"$path/keyframes")))
          kf.join(thumbnails.select(col("media_id")).distinct(),
            Seq("media_id"), "left_anti")
        else kf.toDF()
      fresh.withColumn("batch", lit(batchId.getOrElse(-1L)))
        .write.mode(SaveMode.Append).parquet(s"$path/keyframes")
    }
  }

  /** Start the continuous sink over a media stream. */
  def start(stream: Dataset[Multimodal.MediaRow], checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch {
        (batch: Dataset[Multimodal.MediaRow], id: Long) =>
          writeBatch(batch, Some(id))
      }
      .start()

  /** Small-file compaction under the shared swap discipline. */
  def compact(targetFileBytes: Long = 256L * 1024 * 1024): Unit =
    compactTable("keyframes", targetFileBytes)
}
