package graft.operators.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, continuously-maintained dedup release: the storage twin of
  * [[Dedup.incrementalRelease]] for streaming corpus ingest
  * (`writeStream.foreachBatch((b, id) => store.ingest(b, Some(id)))`).
  *
  * Two parquet tables under `path` — `docs` (the corpus) and `scored`
  * (the accumulated scored pair set, (id_a, id_b, common, n_a, n_b)) —
  * each append guarded by the per-table commit markers every other
  * store uses ([[graft.store.CommitMarkers]]), so at-least-once
  * `foreachBatch` replays are exactly-once: a replay whose docs append
  * already landed recomputes the SAME pair delta (batch membership is
  * id-driven, not "new rows"-driven) and appends only what is missing.
  *
  * Each ingest pays [[Dedup.incrementalScoredPairs]]' cost — the
  * batch's shingle stream probing the accumulated corpus plus the
  * batch self-join; corpus×corpus is never re-joined, which is the only
  * affordable cadence at 100 TB. [[products]] re-derives the full
  * eight-product release from the stored pair set on demand, exactly
  * like a from-scratch [[Dedup.releasePipeline]] over the accumulated
  * corpus (uncapped, bit-identically — ReleaseStoreSpec pins it; the
  * capped df-drift contract is [[Dedup.incrementalRelease]]'s).
  */
final class ReleaseStore(spark: SparkSession, path: String,
    idCol: String, textCol: String, maxShingleDf: Option[Int] = None) {

  private val markers = new graft.store.CommitMarkers(spark, path)

  def docs: DataFrame = spark.read.parquet(s"$path/docs")

  def scored: DataFrame = spark.read.parquet(s"$path/scored")

  /** Last streaming batch id durably written to `table` (−1 if none). */
  def lastCommitted(table: String): Long = markers.lastCommitted(table)

  /** Ingest one micro-batch of documents (idCol, textCol + any carried
    * columns): append the batch to `docs` and its batch-touching scored
    * pair delta to `scored`, each exactly-once under `batchId`.
    */
  def ingest(batch: DataFrame, batchId: Option[Long] = None): Unit = {
    markers.guarded("docs", batchId) {
      batch.write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$path/docs")
    }
    // batch membership by id, so a replay that already appended its docs
    // marks exactly the same rows and recomputes the same delta
    val batchIds = batch.select(col(idCol).as("__bid")).distinct()
    val marked = docs
      .join(broadcast(batchIds), col(idCol) === col("__bid"), "left")
      .withColumn("__isb", col("__bid").isNotNull).drop("__bid")
    markers.guarded("scored", batchId) {
      Dedup.incrementalScoredPairs(marked, idCol, textCol, col("__isb"),
          maxShingleDf)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$path/scored")
      graft.ScratchCache.releaseAll(spark)
    }
  }

  /** The eight-product release over everything ingested so far, derived
    * from the STORED pair set — the pair join is never re-run.
    */
  def products(threshold: Double, quality: DataFrame,
      sourceCol: String = "source",
      containThreshold: Double = 0.8): Dedup.ReleaseProducts =
    Dedup.productsOf(graft.ScratchCache.persist(scored), docs, idCol,
      threshold, quality, sourceCol, containThreshold)
}
