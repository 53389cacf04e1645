package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.decode._
import graft.functions.Ip

/** Driver-checked queries for the datagram-decode chain (SURVEY §2.8
  * I1/I2/I3): RawFlow protobuf envelopes → per-exporter stateful NetFlow
  * decode / stateless sFlow decode → flow rows, all through the real Spark
  * pipeline ([[graft.decode.DecodePipeline]], `flatMapGroupsWithState`).
  *
  * The oracles are VALUES literals pinned to the reference's own golden
  * expectations (`outlet/flow/decoder/netflow/root_test.go:134-228,860-968`,
  * `sflow/root_test.go:44-210`) over the reference's pcap captures — plus,
  * for NetFlow v5, aggregates computed by an independent (non-JVM) parser
  * of the same capture.
  */
object Decode {
  type Q = (SparkSession, String) => DataFrame

  private def pcapRes(name: String): Array[Byte] =
    Pcap.readResource(s"/graft/pcap/$name.pcap")

  /** Replay pcap captures as a single envelope Dataset: one exporter per
    * capture group, interleaved, ordered by `seq` within each group.
    */
  private def envelopes(s: SparkSession,
      groups: Seq[(String, Int, Int, Seq[String])]): org.apache.spark.sql.Dataset[DecodePipeline.RawEnvelope] = {
    import s.implicits._
    val envs = groups.flatMap { case (source, decoder, tsSource, names) =>
      val src = Ip.parse(source)
      names.zipWithIndex.flatMap { case (n, i) =>
        Pcap.datagrams(pcapRes(n)).zipWithIndex.map { case (d, j) =>
          DecodePipeline.envelope(i.toLong * 1000 + j, RawFlow.encode(RawFlow(
            timeReceived = d.tsSec, payload = d.payload, sourceAddress = src,
            decoder = decoder, timestampSource = tsSource)))
        }
      }
    }
    s.createDataset(envs)
  }

  private def rendered(df: org.apache.spark.sql.Dataset[DecodedFlow]): DataFrame =
    df.select(
      Ip.ipToString(col("ExporterAddress")).as("exporter"),
      Ip.ipToString(col("SrcAddr")).as("src_ip"),
      Ip.ipToString(col("DstAddr")).as("dst_ip"),
      col("SamplingRate").as("sampling_rate"),
      col("InIf").as("in_if"), col("OutIf").as("out_if"),
      col("Bytes").as("bytes"), col("Packets").as("packets"),
      col("EType").as("etype"), col("Proto").as("proto"),
      col("SrcPort").as("src_port"), col("DstPort").as("dst_port"),
      col("TCPFlags").as("tcp_flags"),
      col("ForwardingStatus").as("fwd_status"))

  /** I2 NetFlow v9 + IPFIX/RFC 5103 through the stateful Spark pipeline:
    * two exporters decode independently (template state is per-group), the
    * second producing biflow splits.
    */
  val qDecodeNetflow: Q = (s, _) => {
    val envs = envelopes(s, Seq(
      ("127.0.0.1", RawFlow.DecoderNetflow, DecodeOptions.TsInput,
        Seq("options-template", "options-data", "template", "data")),
      ("127.0.0.2", RawFlow.DecoderNetflow, DecodeOptions.TsInput,
        Seq("ipfixprobe-templates", "ipfixprobe-data"))))
    rendered(DecodePipeline.decode(envs))
      .orderBy(col("exporter"), col("src_ip"), col("dst_ip"), col("bytes"))
  }

  /** I2 NetFlow v5 (fixed 48-byte records): per-protocol aggregate over
    * the reference capture, pinned against an independent parser.
    */
  val qDecodeNfv5: Q = (s, _) => {
    val envs = envelopes(s, Seq(
      ("127.0.0.1", RawFlow.DecoderNetflow, DecodeOptions.TsNetflowPacket,
        Seq("nfv5"))))
    DecodePipeline.decode(envs)
      .groupBy(col("Proto").as("proto"))
      .agg(count(lit(1)).as("n_flows"), sum("Bytes").as("bytes"),
        sum("Packets").as("packets"), max("SamplingRate").as("sampling_rate"),
        max("TimeReceived").as("max_ts"))
  }

  /** I2 sFlow v5: raw-header dissection + extended router/gateway
    * attributes (AS path, communities) through the pipeline.
    */
  val qDecodeSflow: Q = (s, _) => {
    val envs = envelopes(s, Seq(
      ("127.0.0.1", RawFlow.DecoderSflow, DecodeOptions.TsInput,
        Seq("sflow-data-1140"))))
    DecodePipeline.decode(envs)
      .select(
        Ip.ipToString(col("ExporterAddress")).as("exporter"),
        Ip.ipToString(col("SrcAddr")).as("src_ip"),
        Ip.ipToString(col("DstAddr")).as("dst_ip"),
        col("SamplingRate").as("sampling_rate"),
        col("InIf").as("in_if"), col("OutIf").as("out_if"),
        col("SrcVlan").as("src_vlan"), col("DstVlan").as("dst_vlan"),
        col("SrcAS").as("src_as"), col("DstAS").as("dst_as"),
        col("Bytes").as("bytes"), col("Packets").as("packets"),
        col("EType").as("etype"), col("Proto").as("proto"),
        col("SrcPort").as("src_port"), col("DstPort").as("dst_port"),
        concat_ws(" ", col("DstASPath")).as("as_path"),
        concat_ws(" ", col("DstCommunities")).as("communities"))
      .groupBy("exporter", "src_ip", "dst_ip", "sampling_rate", "in_if",
        "out_if", "src_vlan", "dst_vlan", "src_as", "dst_as", "bytes",
        "packets", "etype", "proto", "src_port", "dst_port", "as_path",
        "communities")
      .count()
      .withColumnRenamed("count", "n")
  }

  /** I4 per-exporter rate limiting with SamplingRate compensation
    * ([[graft.streaming.RateLimit]]): 5 flows per exporter per minute over
    * the events-derived flow stream; survivors' rate inflates by
    * total/kept so the per-exporter flow estimate is preserved.
    */
  val qRateLimit: Q = (s, dir) => {
    val base = graft.Tables.load(s, dir, "events").select(
      concat(lit("exp"), (col("user_id") % 8).cast("string")).as("exporter"),
      unix_timestamp(col("ts")).as("es"),
      col("event_id"),
      (round(col("value") * 100).cast("long") + 40L).as("bytes"),
      lit(1000L).as("rate"))
    val limited = graft.streaming.RateLimit(
      base, limit = 5L, tickSec = 60L,
      exporterCol = col("exporter"), tsCol = col("es"), rateCol = "rate",
      tiebreak = Seq(col("event_id")))
    limited.groupBy("exporter").agg(
      count(lit(1)).as("n_kept"),
      sum(col("bytes") * col("rate")).as("est_bytes"),
      sum("rate").as("est_flows"))
  }

  /** I7-style drop taxonomy through the decode pipeline: one mixed batch
    * of good, truncated-protobuf, template-less, wrong-decoder and
    * non-encapsulated envelopes, classified per cause
    * ([[DecodePipeline.Drop]] — the reference's per-cause decoder metrics,
    * `outlet/flow/decoder/netflow/root.go:93-216`). The non-encap count is
    * the reference's own golden (4 drops for the v9 capture under VXLAN
    * decap, `root_test.go` non-encap cases).
    */
  val qDecodeDrops: Q = (s, _) => {
    def group(source: String, decoder: Int, decap: Int,
        names: Seq[String]): Seq[DecodePipeline.RawEnvelope] = {
      val src = Ip.parse(source)
      names.zipWithIndex.flatMap { case (n, i) =>
        Pcap.datagrams(pcapRes(n)).zipWithIndex.map { case (d, j) =>
          DecodePipeline.envelope(i.toLong * 1000 + j, RawFlow.encode(RawFlow(
            timeReceived = d.tsSec, payload = d.payload, sourceAddress = src,
            decoder = decoder, decapsulationProtocol = decap)))
        }
      }
    }
    import s.implicits._
    val envs =
      group("127.0.0.1", RawFlow.DecoderNetflow, 0,
        Seq("options-template", "options-data", "template", "data")) ++
      group("10.9.9.9", RawFlow.DecoderNetflow, 0, Seq("data")) ++
      group("10.1.1.1", 9, 0, Seq("data")) ++
      // truncated varint: undecodable RawFlow protobuf
      Seq(DecodePipeline.RawEnvelope("ff", 9000L,
        Array[Byte](0x08, 0x80.toByte))) ++
      // a NetFlow payload fed to the sFlow decoder: version mismatch
      group("10.2.2.2", RawFlow.DecoderSflow, 0, Seq("data")) ++
      group("10.3.3.3", RawFlow.DecoderNetflow, RawFlow.DecapVxlan,
        Seq("template", "data"))
    DecodePipeline.decodeCounted(s.createDataset(envs)).toDF()
      .groupBy(coalesce(col("dropCause"), lit("decoded")).as("cause"))
      .agg(count(lit(1)).as("n"))
  }

  val defs: Map[String, Q] = Map(
    "q_decode_netflow" -> qDecodeNetflow,
    "q_decode_nfv5" -> qDecodeNfv5,
    "q_decode_sflow" -> qDecodeSflow,
    "q_decode_drops" -> qDecodeDrops,
    "q_rate_limit" -> qRateLimit)

  val oracles: Map[String, String] = Map(
    // golden flows from root_test.go:134-228 (exporter 127.0.0.1, v9) and
    // root_test.go:860-968 (exporter 127.0.0.2, IPFIX biflows)
    "q_decode_netflow" ->
      """SELECT * FROM (VALUES
        |  ('127.0.0.1','198.38.121.178','91.170.143.87',30000,335,450,1500,1,2048,6,443,19624,16,64),
        |  ('127.0.0.1','198.38.121.219','88.122.57.97',30000,335,452,1500,1,2048,6,443,2444,16,64),
        |  ('127.0.0.1','173.194.190.106','37.165.129.20',30000,461,306,1400,1,2048,6,443,53697,16,64),
        |  ('127.0.0.1','74.125.100.234','88.120.219.117',30000,461,451,1448,1,2048,6,443,52300,16,64),
        |  ('127.0.0.2','10.10.1.4','10.10.1.1',0,10,0,62,1,2048,17,56166,53,0,0),
        |  ('127.0.0.2','10.10.1.1','10.10.1.4',0,0,10,128,1,2048,17,53,56166,0,0),
        |  ('127.0.0.2','10.10.1.20','10.10.1.255',0,10,0,229,1,2048,17,138,138,0,0),
        |  ('127.0.0.2','10.10.1.4','74.53.140.153',0,10,0,21673,28,2048,6,1470,25,27,0),
        |  ('127.0.0.2','74.53.140.153','10.10.1.4',0,0,10,1546,25,2048,6,25,1470,27,0),
        |  ('127.0.0.2','192.168.1.1','10.10.1.4',0,10,0,2304,4,2048,1,0,0,0,0)
        |) AS t(exporter, src_ip, dst_ip, sampling_rate, in_if, out_if, bytes,
        |       packets, etype, proto, src_port, dst_port, tcp_flags, fwd_status)""".stripMargin,
    // independent-parser aggregates of nfv5.pcap (29 records, packet
    // timestamp 1680626679, sampling interval 0 → rate 1)
    "q_decode_nfv5" ->
      """SELECT * FROM (VALUES
        |  (6, 22, 82858, 70, 1, 1680626679),
        |  (17, 7, 5487, 8, 1, 1680626679)
        |) AS t(proto, n_flows, bytes, packets, sampling_rate, max_ts)""".stripMargin,
    // golden flows from sflow/root_test.go:44-210 (the v6 flow repeats 3×)
    "q_decode_sflow" ->
      """SELECT * FROM (VALUES
        |  ('172.16.0.3','2a0c:8880:2:0:185:21:130:38','2a0c:8880:2:0:185:21:130:39',1024,27,28,100,100,0,0,1500,1,34525,6,46026,22,'','',3),
        |  ('172.16.0.3','104.26.8.24','45.90.161.46',1024,49001,25,0,100,13335,39421,421,1,2048,6,443,56876,'','',1),
        |  ('172.16.0.3','45.90.161.148','191.87.91.27',1024,28,49001,100,0,39421,26615,40,1,2048,6,55658,5555,'203698 6762 26615','2583495656 2583495657 4259880000 4259880001 4259900001',1)
        |) AS t(exporter, src_ip, dst_ip, sampling_rate, in_if, out_if,
        |       src_vlan, dst_vlan, src_as, dst_as, bytes, packets, etype,
        |       proto, src_port, dst_port, as_path, communities, n)""".stripMargin,
    // per-cause drop counts for the mixed batch: 4 good v9 flows, one
    // drop of each envelope-level cause, and the reference's 4-drop
    // non-encap golden for the v9 capture under VXLAN decap
    "q_decode_drops" ->
      """SELECT * FROM (VALUES
        |  ('decoded', 4), ('malformed_datagram', 1), ('malformed_envelope', 1),
        |  ('non_encap', 4), ('template_missing', 1), ('unknown_decoder', 1)
        |) AS t(cause, n)""".stripMargin,
    "q_rate_limit" ->
      """WITH base AS (SELECT 'exp' || CAST(user_id % 8 AS VARCHAR) AS exporter,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es, event_id,
        |    CAST(round(value*100) AS BIGINT) + 40 AS bytes, 1000 AS rate
        |  FROM events),
        |win AS (SELECT exporter, es, event_id, bytes, rate,
        |    row_number() OVER (PARTITION BY exporter, es // 60
        |      ORDER BY es, event_id) AS rn,
        |    count(*) OVER (PARTITION BY exporter, es // 60) AS total
        |  FROM base),
        |kept AS (SELECT exporter, bytes,
        |    (rate * total) // least(total, 5) AS new_rate
        |  FROM win WHERE rn <= 5)
        |SELECT exporter, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(bytes * new_rate) AS BIGINT) AS est_bytes,
        |  CAST(sum(new_rate) AS BIGINT) AS est_flows
        |FROM kept GROUP BY 1""".stripMargin)
}
