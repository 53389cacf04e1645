package graft.sources

import java.net.InetSocketAddress
import java.nio.ByteBuffer
import java.nio.channels.DatagramChannel
import java.sql.Timestamp

import graft.SparkSpec
import graft.decode.{DecodePipeline, Pcap}
import graft.functions.Ip
import graft.store.FlowStore
import graft.streaming.{Enrichment, FlowIngest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** UDP inlet source (S1) proven on loopback: real datagrams through a real
  * socket into the `graft-udp` DataSource V2 stream, decoded by the same
  * stateful pipeline as the pcap-replay path — the socket front-end of
  * `inlet/flow/input/udp/root.go` with the reference's own captures as
  * traffic.
  */
class UdpSourceSpec extends SparkSpec {

  private def datagrams(name: String): Seq[Array[Byte]] =
    Pcap.datagrams(Pcap.readResource(s"/graft/pcap/$name.pcap")).map(_.payload)

  /** Send payloads in order from one client socket (loopback preserves
    * ordering through the single kernel queue + single receiver thread).
    */
  private def send(port: Int, payloads: Seq[Array[Byte]]): Unit = {
    val client = DatagramChannel.open()
    try {
      client.connect(new InetSocketAddress("127.0.0.1", port))
      payloads.foreach(p => client.write(ByteBuffer.wrap(p)))
    } finally client.close()
  }

  /** Parquet row count, 0 while the sink has not produced a data file yet
    * (reading a file-less directory throws).
    */
  private def countOr0(path: String): Long =
    try spark.read.parquet(path).count() catch { case _: Exception => 0L }

  /** Drive the query until `done` or timeout: the receiver thread fills the
    * buffer asynchronously, so processAllAvailable alone can run before the
    * datagrams have landed.
    */
  private def awaitCondition(q: StreamingQuery, timeoutMs: Long = 30000L)(done: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!done && System.currentTimeMillis() < deadline) {
      q.processAllAvailable()
      if (!done) Thread.sleep(50L)
    }
    assert(done, "condition not reached before timeout")
  }

  private def startSource(name: String, decoder: String, tsSource: String,
      out: String, checkpoint: String): StreamingQuery = {
    import spark.implicits._
    val envs = spark.readStream
      .format("graft-udp")
      .option("name", name)
      .option("decoder", decoder)
      .option("timestampSource", tsSource)
      .load()
      .as[DecodePipeline.RawEnvelope]
    DecodePipeline.decode(envs).writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .start()
  }

  test("socket → decode: NetFlow v5 golden flows arrive via loopback UDP") {
    val root = java.nio.file.Files.createTempDirectory("udp-nfv5").toString
    val q = startSource("udp-nfv5", "netflow", "netflow-packet",
      s"$root/out", s"$root/_checkpoint")
    try {
      val port = awaitPort("udp-nfv5")
      send(port, datagrams("nfv5"))
      awaitCondition(q)(countOr0(s"$root/out") >= 29)
    } finally q.stop()

    val flows = spark.read.parquet(s"$root/out").collect()
    assert(flows.length == 29) // every record of the capture's one datagram
    val first = flows.filter(_.getAs[Int]("SrcPort") == 30104).head
    // the DecoderSpec golden (root_test.go:633-687) seen through the wire:
    // TsNetflowPacket ⇒ TimeReceived from the v5 header, not receive time
    assert(first.getAs[Long]("TimeReceived") == 1680626679L)
    assert(first.getAs[Long]("Bytes") == 133L)
    assert(first.getAs[Long]("Packets") == 1L)
    assert(first.getAs[Long]("SamplingRate") == 1L)
    assert(Ip.render(first.getAs[Array[Byte]]("SrcAddr")) == "161.202.212.212")
    assert(Ip.render(first.getAs[Array[Byte]]("DstAddr")) == "202.152.70.24")
    // the exporter address is stamped from the SENDING socket, not the
    // payload — loopback traffic decodes with a loopback exporter
    assert(Ip.render(first.getAs[Array[Byte]]("ExporterAddress")) == "127.0.0.1")
  }

  test("multi-worker listeners share one port via SO_REUSEPORT") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("udp-workers").toString
    val envs = spark.readStream
      .format("graft-udp")
      .option("name", "udp-workers")
      .option("workers", "4")
      .option("decoder", "netflow")
      .option("timestampSource", "netflow-packet")
      .load()
      .as[DecodePipeline.RawEnvelope]
    val q = DecodePipeline.decode(envs).writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/_checkpoint")
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      val port = awaitPort("udp-workers")
      // 20 v5 datagrams from 20 distinct client sockets so the kernel's
      // 4-tuple hash actually spreads them across the 4 worker sockets
      val payload = datagrams("nfv5").head
      (1 to 20).foreach(_ => send(port, Seq(payload)))
      awaitCondition(q)(countOr0(s"$root/out") >= 20 * 29)
      // listener counters mirror the reference's packets/bytes metrics
      val st = UdpFlowSource.stats("udp-workers").get
      assert(st.packets == 20L && st.bytes == 20L * payload.length)
      assert(st.errors == 0L && st.dropped == 0L)
    } finally q.stop()
    assert(UdpFlowSource.stats("udp-workers").isEmpty, "unregistered on stop")
    assert(spark.read.parquet(s"$root/out").count() == 20L * 29)
  }

  test("socket → decode → store → line query: the v9 chain end to end") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("udp-ingest").toString

    import spark.implicits._
    val metadata = Enrichment.MetadataDim(
      Seq(306, 335, 450, 451, 452, 461).map(i =>
        (Ip.parse("127.0.0.1"), i, "edge1", s"eth$i", s"if $i", 10000L,
          "transit", "p1", "external"))
        .toDF("exporter_addr", "if_index", "exporter_name", "if_name",
          "if_desc", "if_speed", "if_connectivity", "if_provider",
          "if_boundary"))
    def enrich(decoded: DataFrame): DataFrame = {
      val named = decoded.select(
        timestamp_seconds(col("TimeReceived")).as("TimeReceived"),
        col("ExporterAddress"),
        col("InIf").cast("int").as("InIfIndex"),
        col("OutIf").cast("int").as("OutIfIndex"),
        col("Bytes"), col("Packets"), col("SamplingRate"))
      Enrichment.withMetadata(named, metadata).drop("InIfIndex", "OutIfIndex")
    }

    val envs = spark.readStream
      .format("graft-udp")
      .option("name", "udp-v9")
      .option("decoder", "netflow")
      .option("timestampSource", "netflow-packet")
      .load()
      .as[DecodePipeline.RawEnvelope]
    val store = new FlowStore(spark, root)
    val q = FlowIngest.start(
      DecodePipeline.decode(envs).toDF(), store,
      checkpoint = s"$root/_checkpoint", enrich = enrich,
      trigger = Trigger.ProcessingTime(0L))
    try {
      val port = awaitPort("udp-v9")
      // templates, option data, then data — real exporters announce in
      // this order; the template state must be live when data lands
      send(port, Seq("options-template", "options-data", "template", "data")
        .flatMap(datagrams))
      awaitCondition(q)(countOr0(s"$root/flows") >= 4)
    } finally q.stop()

    val flows = spark.read.parquet(s"$root/flows")
    assert(flows.count() == 4)
    val byIf = flows.groupBy("InIfName").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byIf == Map("eth335" -> 2L, "eth461" -> 2L))

    // line query over the written store: Σ xps·interval must equal
    // Σ Bytes·SamplingRate·8 of the golden capture (5848 × 30000 × 8)
    val tsMin = flows.agg(min(unix_timestamp(col("TimeReceived"))))
      .collect()(0).getLong(0)
    val start = Timestamp.from(
      java.time.Instant.ofEpochSecond(tsMin - tsMin % 3600))
    val end = Timestamp.from(start.toInstant.plusSeconds(3600))
    val line = new graft.queryengine.LineQuery(
      graft.schema.FlowSchema.schema, store.tables())
    val rows = line.build(spark, graft.queryengine.LineInput(
      start = start, end = end, points = 6,
      dimensions = Seq("ExporterName"), limit = 5, unit = "l3bps")).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => math.round(r.getAs[Double]("xps") * 600)).sum
    assert(total == 5848L * 30000L * 8L)
  }

  test("checkpoint recovery fast-forwards past a previous socket's offsets") {
    // a restarted query replays offsets minted by the PREVIOUS socket:
    // recovery must neither crash on the replayed commit nor let new
    // datagrams alias the committed range (which would silently drop them)
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("name", "udp-restart"))
    val stream = new UdpMicroBatchStream(opts)
    try {
      stream.deserializeOffset("500")
      stream.commit(UdpOffset(500L)) // replayed commit: must not throw
      assert(stream.latestOffset().asInstanceOf[UdpOffset].n == 500L)
      val port = awaitPort("udp-restart")
      send(port, Seq(datagrams("nfv5").head))
      val deadline = System.currentTimeMillis() + 10000L
      while (stream.latestOffset().asInstanceOf[UdpOffset].n < 501L &&
        System.currentTimeMillis() < deadline) Thread.sleep(20L)
      assert(stream.latestOffset().asInstanceOf[UdpOffset].n == 501L)
      // the live datagram is numbered AFTER the checkpoint and is emitted
      val parts = stream.planInputPartitions(UdpOffset(500L), UdpOffset(501L))
      assert(parts.length == 1)
      val rows = parts(0).asInstanceOf[UdpInputPartition].rows
      assert(rows.length == 1 && rows(0)._2 == 500L)
    } finally stream.stop()
  }

  private def awaitPort(name: String, timeoutMs: Long = 10000L): Int = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (UdpFlowSource.boundPort(name).isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(20L)
    val p = UdpFlowSource.boundPort(name)
    assert(p.nonEmpty, s"source '$name' never bound its socket")
    p.get
  }
}
