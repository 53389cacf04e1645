package graft.sources

import graft.SparkSpec
import graft.decode.{DecodePipeline, RawFlow}
import org.apache.spark.sql.functions._

/** The Kafka hand-off minus the broker: the record/envelope projections
  * are exercised on their exact bytes, and the environment block (no
  * spark-sql-kafka jar on the offline box) is pinned as a TESTED error,
  * not an assumed one.
  */
class KafkaWiringSpec extends SparkSpec {
  import spark.implicits._

  private def sampleEnvelopes = {
    val raws = Seq(
      RawFlow(timeReceived = 1000L, payload = Array[Byte](1, 2, 3),
        sourceAddress = graft.decode.Addr.to16(Array[Byte](10, 0, 0, 1)),
        decoder = RawFlow.DecoderNetflow),
      RawFlow(timeReceived = 1001L, payload = Array[Byte](9, 8),
        sourceAddress = graft.decode.Addr.to16(Array[Byte](10, 0, 0, 2)),
        decoder = RawFlow.DecoderSflow, rateLimit = 42L))
    raws.zipWithIndex.map { case (r, i) =>
      DecodePipeline.envelope(i.toLong, RawFlow.encode(r))
    }
  }

  test("sink records carry the envelope bytes; by-exporter key is the address") {
    val recs = FlowKafka.sinkRecords(spark.createDataset(sampleEnvelopes))
      .as[(Array[Byte], Array[Byte])].collect()
    assert(recs.length == 2)
    recs.zip(sampleEnvelopes).foreach { case ((key, value), env) =>
      assert(new String(key, "UTF-8") == env.exporter) // one partition per exporter
      assert(value.sameElements(env.data))             // payload byte-exact
      val raw = RawFlow.decode(value).get
      assert(raw.timeReceived == 1000L || raw.timeReceived == 1001L)
    }
  }

  test("random load-balance mode sends a null key") {
    val keys = FlowKafka.sinkRecords(
      spark.createDataset(sampleEnvelopes), byExporter = false)
      .select("key").collect()
    assert(keys.forall(_.isNullAt(0)))
  }

  test("consumer rows round-trip to decode-ready envelopes, offset as seq") {
    // rows shaped exactly like format("kafka") output: (value, offset)
    val kafkaShaped = spark.createDataset(sampleEnvelopes)
      .toDF().selectExpr("data AS value", "seq + 7 AS offset",
        "'flows-v5' AS topic", "0 AS partition")
    val envs = FlowKafka.sourceEnvelopes(kafkaShaped)
      .collect().sortBy(_.seq)
    assert(envs.map(_.seq).toSeq == Seq(7L, 8L))
    envs.zip(sampleEnvelopes).foreach { case (got, sent) =>
      assert(got.exporter == sent.exporter) // group key re-derived from bytes
      assert(got.data.sameElements(sent.data))
    }
  }

  test("sink → consumer → decode pipeline yields the original payloads") {
    val recs = FlowKafka.sinkRecords(spark.createDataset(sampleEnvelopes))
      .withColumn("offset", monotonically_increasing_id())
    val envs = FlowKafka.sourceEnvelopes(recs).collect()
    val payloads = envs.flatMap(e => RawFlow.decode(e.data)).map(_.payload.toSeq)
    assert(payloads.toSet == Set(Seq[Byte](1, 2, 3), Seq[Byte](9, 8)))
  }

  test("enriched re-emit records are exporter-keyed JSON rows") {
    val flows = Seq(("192.0.2.1", 443, 100L)).toDF(
      "ExporterAddress", "DstPort", "Bytes")
    val (key, value) = FlowKafka.enrichedRecords(flows)
      .as[(Array[Byte], Array[Byte])].head()
    assert(new String(key, "UTF-8") == "192.0.2.1")
    val json = new String(value, "UTF-8")
    assert(json.contains("\"DstPort\":443") && json.contains("\"Bytes\":100"))
  }

  test("topic names are schema-versioned like the reference") {
    assert(FlowKafka.topicName() == "flows-v5")
    assert(FlowKafka.topicName("nfx") == "nfx-v5")
  }

  test("the connector-jar environment block is the pinned, expected error") {
    val e = intercept[Throwable] {
      FlowKafka.rawFlowSource(spark, brokers = "localhost:9092")
    }
    val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
    assert(msg.toLowerCase.contains("kafka"),
      s"expected the missing-connector error, got: $e")
    assert(msg.contains("Failed to find") || msg.contains("ClassNotFound") ||
      e.isInstanceOf[ClassNotFoundException],
      s"expected a data-source lookup failure, got: $e")
  }
}
