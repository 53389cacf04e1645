package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Saved-filter store (reference `console/database/`: user-saved filter
  * texts behind the console). Append-only parquet with
  * ReplacingMergeTree-style latest-wins reads and tombstone deletes — the
  * same merge-on-read discipline as the flow tables, so no update-in-place
  * storage is needed.
  */
final class SavedFilters(spark: SparkSession, path: String) {
  import spark.implicits._

  // Wall-clock epoch millis so ordering survives JVM/host restarts
  // (nanoTime has an arbitrary per-boot origin). The low 20 bits break
  // same-millisecond ties: 8 random bits fixed per instance separate
  // concurrent writer processes, 12 counter bits order writes within one.
  // millis << 20 stays below the Long sign bit until year ~2248.
  private val nonce = (new java.security.SecureRandom().nextInt(256)).toLong
  private val tiebreak = new java.util.concurrent.atomic.AtomicLong(0L)
  private def nextSeq(): Long =
    (System.currentTimeMillis() << 20) | (nonce << 12) |
      (tiebreak.getAndIncrement() & 0xfffL)

  private def append(user: String, description: String, content: String,
      deleted: Boolean): Unit =
    Seq((user, description, content, deleted, nextSeq()))
      .toDF("user", "description", "content", "deleted", "seq")
      .write.mode(SaveMode.Append).parquet(path)

  def save(user: String, description: String, content: String): Unit =
    append(user, description, content, deleted = false)

  def delete(user: String, description: String): Unit =
    append(user, description, "", deleted = true)

  /** Latest non-deleted filter per (user, description). Empty before the
    * first save (no parquet files yet).
    */
  def list(user: String): DataFrame = {
    // only a missing path means "no filters yet" — corruption, permission,
    // or IO failures must surface, not read as an empty store
    val stored = try spark.read.parquet(path) catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" =>
        spark.emptyDataFrame
          .select(lit("").as("user"), lit("").as("description"),
            lit("").as("content"), lit(false).as("deleted"), lit(0L).as("seq"))
    }
    val w = Window.partitionBy("user", "description").orderBy(desc("seq"))
    stored
      .where(col("user") === user)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && !col("deleted"))
      .select("user", "description", "content")
  }
}
