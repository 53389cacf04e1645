package graft.operators.pack

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: documents are laid end-to-end in a
  * deterministic order and cut into fixed-size token windows — the
  * standard LLM-pretraining packing step (each window is one training
  * sequence; documents may straddle a boundary).
  *
  * Scale shape: the global running token offset is a **two-phase prefix
  * sum**, not a single-partition global sort. Documents are sharded by
  * id range; phase 1 computes per-shard cumulative sums with a window
  * partitioned by shard (parallel across shards); phase 2 accumulates
  * shard totals — one row per shard, thousands of rows at 100 TB — into
  * exclusive shard offsets and broadcasts them back. Every document's
  * global offset is then shard offset + local cumsum, with no stage that
  * moves the corpus through one partition.
  */
object SequencePacking {

  /** Assigns every document its global token offset and window.
    *
    * @param df           input with a numeric id column and a token count
    * @param idCol        numeric, unique; packing order is ascending id
    * @param tokensCol    per-document token count column name
    * @param windowTokens tokens per training window
    * @param shardSize    documents per prefix-sum shard (id-range width)
    * @return (id, toks, start_tok, window_id, spans_boundary)
    */
  def pack(df: DataFrame, idCol: String, tokensCol: String,
      windowTokens: Int, shardSize: Long = 4096L): DataFrame = {
    require(windowTokens > 0 && shardSize > 0)
    // materialize once: the window branch and the shard-totals branch both
    // consume this (possibly expensive) upstream projection
    val base = graft.ScratchCache.persist(
      df.select(col(idCol).cast("long").as("id"),
          col(tokensCol).cast("long").as("toks"))
        .withColumn("shard", expr(s"id div $shardSize")))
    // phase 1: per-shard inclusive cumsum (parallel across shards)
    val wLocal = Window.partitionBy("shard").orderBy("id")
    val local = base.withColumn("local_end", sum("toks").over(wLocal))
    // phase 2: exclusive running offset over shard totals (one row/shard)
    val wShard = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("shard").agg(sum("toks").as("shard_total"))
      .withColumn("offset", coalesce(sum("shard_total").over(wShard), lit(0L)))
      .select("shard", "offset")
    local.join(broadcast(offsets), Seq("shard"))
      .withColumn("start_tok", col("offset") + col("local_end") - col("toks"))
      .withColumn("window_id", expr(s"start_tok div $windowTokens"))
      .withColumn("spans_boundary",
        expr(s"(start_tok + toks - 1) div $windowTokens") =!= col("window_id"))
      .select("id", "toks", "start_tok", "window_id", "spans_boundary")
  }
}
