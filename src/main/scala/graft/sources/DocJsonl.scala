package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document-corpus ingestion with corrupt-record routing — the
  * document plane's analog of the flow decoder's per-cause drop
  * counters ([[graft.decode.DecodePipeline]] / `q_decode_drops`): a
  * web-scale corpus drop always has malformed lines, missing fields,
  * and type drift, and silently losing them hides acquisition bugs.
  *
  * Reads PERMISSIVE with an explicit schema (never `inferSchema` — at
  * 100 TB schema inference is an extra full scan) plus the corrupt
  * record column; every input line is routed exactly once:
  *
  *  - `good`: parses and carries non-null `doc_id` and `text`
  *  - `bad`: everything else, tagged with a cause —
  *    `malformed_json` (unparseable line, or any type-mismatched field:
  *    PERMISSIVE corrupts the WHOLE record on type drift, preserving the
  *    raw line), `missing_id` / `missing_text` (parseable but a required
  *    field is absent or null)
  *
  * Scale shape: one pass, no shuffle — routing is a codegen'd
  * projection; the per-cause counts are a 3-row aggregate. Text files
  * split by line across executors like any Spark text source.
  */
object DocJsonl {

  /** The corpus schema (mirrors `documents.parquet`), plus the corrupt
    * record column PERMISSIVE mode fills for unparseable lines.
    */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  private val cause: org.apache.spark.sql.Column =
    when(col("_corrupt_record").isNotNull, "malformed_json")
      .when(col("doc_id").isNull, "missing_id")
      .when(col("text").isNull, "missing_text")

  /** Parse `path`. Returns every line tagged: the document columns plus
    * `drop_cause` (null = good row). Callers split with [[good]] /
    * [[bad]] or roll up with [[dropCounts]].
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("drop_cause", cause)

  /** Streaming twin of [[read]]: watch a directory for JSONL files
    * (micro-batch file source — the corpus-drop ingest loop). Same
    * schema, same routing projection; [[good]]/[[bad]]/[[dropCounts]]
    * compose on the result unchanged (dropCounts as a streaming
    * complete-mode aggregate).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .withColumn("drop_cause", cause)

  /** The clean corpus: rows that parsed with both required fields. */
  def good(tagged: DataFrame): DataFrame =
    tagged.where(col("drop_cause").isNull)
      .select("doc_id", "text", "lang", "source", "n_chars")

  /** The reject stream: raw line (for malformed JSON) or re-assembled
    * fields, with the drop cause — routed to a quarantine sink in a
    * real pipeline.
    */
  def bad(tagged: DataFrame): DataFrame =
    tagged.where(col("drop_cause").isNotNull)
      .select(col("drop_cause"), col("_corrupt_record").as("raw"),
        col("doc_id"), col("text"))

  /** Per-cause drop counters (the `q_decode_drops` shape). */
  def dropCounts(tagged: DataFrame): DataFrame =
    tagged.where(col("drop_cause").isNotNull)
      .groupBy("drop_cause").agg(count(lit(1)).as("n"))
}
