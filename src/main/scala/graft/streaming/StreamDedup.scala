package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous corpus ingestion: the
  * stream analogue of [[graft.operators.dedup.Dedup.exact]]. Rows are
  * keyed by content hash and duplicates are dropped in the state store;
  * `dropDuplicatesWithinWatermark` bounds that state to the watermark
  * horizon — the only shape that survives an unbounded stream (a plain
  * `dropDuplicates` would grow keeper state forever). Re-appearances
  * beyond the watermark are left for the batch dedup pass over the store
  * (merge-on-read discipline, like the rollup tables).
  */
object StreamDedup {

  /** Drops rows whose `textCol` content already arrived within the
    * watermark window. The 32-byte hash — not the payload — is the dedup
    * state key (SHA-256: content identity must resist constructed
    * collisions, see [[graft.operators.dedup.Dedup.exact]]).
    */
  def exactWithinWatermark(stream: DataFrame, textCol: String,
      tsCol: String, watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
