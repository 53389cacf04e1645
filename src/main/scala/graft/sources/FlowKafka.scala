package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.decode.DecodePipeline
import graft.decode.DecodePipeline.RawEnvelope

/** Kafka wiring for the inlet→outlet hand-off (SURVEY §2 S3/S4/S6;
  * reference `inlet/kafka/root.go:55-133`, `outlet/kafkainput/root.go`,
  * `outlet/kafkaoutput/root.go`): RawFlow protobuf envelopes ride topic
  * `<base>-v<version>`, keyed by exporter address (or random for
  * uniform spread), and the outlet consumes them straight into
  * [[DecodePipeline]].
  *
  * The record/envelope transforms are plain DataFrame projections,
  * testable without a broker (`KafkaWiringSpec` round-trips the exact
  * bytes). Only the `format("kafka")` boundary needs the
  * spark-sql-kafka connector jar — absent in this sandbox (offline
  * resolver, no broker), so the entry points raise Spark's
  * "Failed to find data source: kafka" at `load()`/`start()`; the spec
  * pins that exact error so the blocked status is tested, not assumed.
  *
  * Scale notes: by-exporter keys put each exporter's datagrams on ONE
  * partition (reference `common/kafka/config.go:86-97`), so Kafka offsets
  * give the decode stage a per-exporter monotonic sequence — the reorder
  * window then only absorbs producer-side batching, not cross-partition
  * races. `maxOffsetsPerTrigger` is the back-pressure knob standing in
  * for the reference's 1→8 consumer worker scaler
  * (`outlet/kafkainput/scaler.go`): Spark sizes micro-batches instead of
  * scaling goroutines.
  */
object FlowKafka {

  /** RawFlow envelope schema version — topic names are schema-versioned
    * (reference `common/pb/rawflow.go:20`, `inlet/kafka/root.go:55`).
    */
  val EnvelopeVersion = 5

  /** `flows` → `flows-v5`, the reference's `%s-v%d` topic convention. */
  def topicName(base: String = "flows"): String = s"$base-v$EnvelopeVersion"

  // ---- record/envelope projections (broker-free, spec'd) ----------------

  /** Envelope rows → Kafka producer records: `value` = the RawFlow
    * protobuf bytes exactly as received, `key` = exporter address (all of
    * an exporter's records land on one partition) or null (the sink's
    * default partitioner spreads uniformly — the reference's
    * LoadBalanceRandom / UniformBytesPartitioner mode).
    */
  def sinkRecords(envelopes: Dataset[RawEnvelope],
      byExporter: Boolean = true): DataFrame =
    envelopes.toDF().select(
      (if (byExporter) col("exporter").cast("binary")
       else lit(null).cast("binary")).as("key"),
      col("data").as("value"))

  /** Kafka consumer rows (`value binary`, `offset long`, as
    * `format("kafka")` emits them) → [[RawEnvelope]] rows for
    * [[DecodePipeline.decode]]. The Kafka offset IS the decode sequence:
    * per-partition monotonic, and with by-exporter keys that means
    * per-exporter monotonic.
    */
  def sourceEnvelopes(kafkaRows: DataFrame): Dataset[RawEnvelope] = {
    val spark = kafkaRows.sparkSession
    import spark.implicits._
    kafkaRows.select(col("offset").cast("long"), col("value"))
      .as[(Long, Array[Byte])]
      .map { case (offset, value) => DecodePipeline.envelope(offset, value) }
  }

  /** Enriched flow rows → third-party re-emit records (S6): `key` =
    * exporter address, `value` = the row as JSON. (The reference emits
    * its protobuf schema here; JSON is the self-describing stand-in —
    * the payload codec is one projection swap.)
    */
  def enrichedRecords(flows: DataFrame,
      exporterCol: String = "ExporterAddress"): DataFrame =
    flows.select(
      col(exporterCol).cast("string").cast("binary").as("key"),
      to_json(struct(flows.columns.map(col).toIndexedSeq: _*))
        .cast("binary").as("value"))

  // ---- broker-facing entry points (need the connector jar) --------------

  /** S3 inlet producer: stream RawFlow envelopes to `<base>-v5`. Caller
    * sets `option("checkpointLocation", ...)` and `start()`.
    */
  def rawFlowSink(envelopes: Dataset[RawEnvelope], brokers: String,
      topicBase: String = "flows",
      byExporter: Boolean = true): DataStreamWriter[Row] =
    sinkRecords(envelopes, byExporter).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topicName(topicBase))

  /** S4 outlet consumer: subscribe to `<base>-v5` as a consumer group and
    * emit decode-ready envelopes. `maxOffsetsPerTrigger` bounds each
    * micro-batch (the back-pressure stand-in for the reference's worker
    * scaler); decode with
    * `DecodePipeline.decode(FlowKafka.rawFlowSource(...), ...)`.
    */
  def rawFlowSource(spark: SparkSession, brokers: String,
      topicBase: String = "flows", groupId: String = "graft-outlet",
      maxOffsetsPerTrigger: Long = 500000L): Dataset[RawEnvelope] =
    sourceEnvelopes(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topicName(topicBase))
      .option("kafka.group.id", groupId)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
      .load())

  /** S6 outlet producer: re-emit enriched flows for third parties. */
  def enrichedSink(flows: DataFrame, brokers: String, topic: String,
      exporterCol: String = "ExporterAddress"): DataStreamWriter[Row] =
    enrichedRecords(flows, exporterCol).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
}
