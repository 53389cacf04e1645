package graft.streaming

import java.net.InetSocketAddress
import java.nio.ByteBuffer
import java.nio.channels.DatagramChannel
import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import graft.decode.{DecodePipeline, Pcap}
import graft.functions.Ip
import graft.sources.UdpFlowSource
import graft.store.FlowStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The composed production loop (reference `outlet/core/worker.go:61-143`):
  * UDP socket → stateful decode → per-exporter rate limit → enrichment →
  * exactly-once MV fan-out, driven across multiple micro-batches WITH a
  * mid-stream kill + checkpoint recovery. Every stage has its own spec;
  * this suite asserts the restart path of the whole composition: no row
  * lost, no row duplicated, in any of the five tables.
  */
class StreamingSoakSpec extends SparkSpec {

  private def datagrams(name: String): Seq[Array[Byte]] =
    Pcap.datagrams(Pcap.readResource(s"/graft/pcap/$name.pcap")).map(_.payload)

  private def send(port: Int, payloads: Seq[Array[Byte]]): Unit = {
    val client = DatagramChannel.open()
    try {
      client.connect(new InetSocketAddress("127.0.0.1", port))
      payloads.foreach(p => client.write(ByteBuffer.wrap(p)))
    } finally client.close()
  }

  private def countOr0(path: String): Long =
    try spark.read.parquet(path).count() catch { case _: Exception => 0L }

  private def awaitCondition(q: StreamingQuery, timeoutMs: Long = 30000L)(
      done: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!done && System.currentTimeMillis() < deadline) {
      q.processAllAvailable()
      if (!done) Thread.sleep(50L)
    }
    assert(done, "condition not reached before timeout")
  }

  private def awaitPort(name: String, timeoutMs: Long = 10000L): Int = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (UdpFlowSource.boundPort(name).isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(20L)
    val p = UdpFlowSource.boundPort(name)
    assert(p.nonEmpty, s"source '$name' never bound its socket")
    p.get
  }

  /** Delete the newest checkpoint commit log entry so recovery re-runs
    * the final batch id through foreachBatch — the crash window between
    * the table writes and the checkpoint's commit.
    */
  private def dropNewestCommit(checkpoint: String): Long = {
    val dir = new java.io.File(s"$checkpoint/commits")
    val ids = dir.listFiles().map(_.getName).filter(_.forall(_.isDigit))
      .map(_.toLong)
    assert(ids.nonEmpty, "no committed batches to drop")
    val newest = ids.max
    assert(new java.io.File(dir, newest.toString).delete())
    // the local ChecksumFileSystem's sidecar would fail the re-commit's
    // rename if left behind
    new java.io.File(dir, s".$newest.crc").delete()
    newest
  }

  private def bytesOf(root: String, table: String): Long =
    spark.read.parquet(s"$root/$table").agg(sum("Bytes"))
      .collect()(0).getLong(0)

  test("udp → decode → rate-limit → enrich → fan-out soaks across " +
      "micro-batches and a kill + checkpoint recovery") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("soak").toString
    val checkpoint = s"$root/_checkpoint"

    val metadata = Enrichment.MetadataDim(
      Seq(306, 335, 450, 451, 452, 461).map(i =>
        (Ip.parse("127.0.0.1"), i, "edge1", s"eth$i", s"if $i", 10000L,
          "transit", "p1", "external"))
        .toDF("exporter_addr", "if_index", "exporter_name", "if_name",
          "if_desc", "if_speed", "if_connectivity", "if_provider",
          "if_boundary"))
    def enrich(decoded: DataFrame): DataFrame = {
      // rate limit first (I4): generous budget — the soak verifies the
      // operator rides the composition, RateLimitSpec covers its drops
      val limited = RateLimit(decoded, limit = 100L, tickSec = 60L,
        col("ExporterAddress"), col("TimeReceived"), "SamplingRate",
        tiebreak = Seq(col("Bytes")))
      val named = limited.select(
        timestamp_seconds(col("TimeReceived")).as("TimeReceived"),
        col("ExporterAddress"),
        col("InIf").cast("int").as("InIfIndex"),
        col("OutIf").cast("int").as("OutIfIndex"),
        col("Bytes"), col("Packets"), col("SamplingRate"))
      Enrichment.withMetadata(named, metadata).drop("InIfIndex", "OutIfIndex")
    }

    def startIngest(): StreamingQuery = {
      val envs = spark.readStream
        .format("graft-udp")
        .option("name", "udp-soak")
        .option("decoder", "netflow")
        .option("timestampSource", "netflow-packet")
        .load()
        .as[DecodePipeline.RawEnvelope]
      FlowIngest.start(
        DecodePipeline.decode(envs).toDF(), new FlowStore(spark, root),
        checkpoint = checkpoint, enrich = enrich,
        trigger = Trigger.ProcessingTime(0L))
    }

    val announce = Seq("options-template", "options-data", "template")
      .flatMap(datagrams)
    val data = datagrams("data") // 4 golden flows, 2 per interface

    // ---- phase A: two awaited micro-batch rounds, then kill
    val q1 = startIngest()
    try {
      val port = awaitPort("udp-soak")
      send(port, announce ++ data)
      awaitCondition(q1)(countOr0(s"$root/flows") >= 4)
      send(port, data)
      awaitCondition(q1)(countOr0(s"$root/flows") >= 8)
    } finally q1.stop()

    val afterA = bytesOf(root, "flows")
    // crash window: the final batch's tables are written and marked, but
    // the checkpoint never recorded the batch as committed
    dropNewestCommit(checkpoint)

    // ---- phase B: recover from the checkpoint, then a third round
    val q2 = startIngest()
    try {
      // recovery replays the dropped batch id through foreachBatch; the
      // socket's datagrams died with q1 (UDP is loss-bounded, reference
      // semantics), so the replay re-fires with whatever the new socket
      // can plan for the stale range — the fast-forwarded offsets and the
      // commit markers must keep the store unchanged either way
      q2.processAllAvailable()
      assert(bytesOf(root, "flows") == afterA,
        "recovery replay duplicated rows in the main table")
      val port = awaitPort("udp-soak")
      send(port, announce ++ data)
      awaitCondition(q2)(countOr0(s"$root/flows") >= 12)
    } finally q2.stop()

    // ---- no loss, no duplication, in every one of the 5 tables
    val flows = spark.read.parquet(s"$root/flows")
    assert(flows.count() == 12, "3 rounds x 4 golden flows, exactly once")
    val mainBytes = bytesOf(root, "flows")
    assert(mainBytes == 3 * 5848L,
      "main-table Bytes must be exactly 3 golden captures")
    for (t <- Seq("flows_1m", "flows_5m", "flows_1h"))
      assert(bytesOf(root, t) == mainBytes,
        s"$t re-aggregation lost or duplicated bytes across the restart")
    val exporters = spark.read.parquet(s"$root/exporters")
    assert(exporters.select("ExporterName").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("edge1"))

    // enrichment survived the whole chain (both directions resolved)
    val byIf = flows.groupBy("InIfName").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byIf == Map("eth335" -> 6L, "eth461" -> 6L))

    // and the store answers the line query with exact conservation:
    // sum xps*interval == sum Bytes*SamplingRate*8 of 3 captures
    val tsMin = flows.agg(min(unix_timestamp(col("TimeReceived"))))
      .collect()(0).getLong(0)
    val start = Timestamp.from(Instant.ofEpochSecond(tsMin - tsMin % 3600))
    val end = Timestamp.from(start.toInstant.plusSeconds(3600))
    val store = new FlowStore(spark, root)
    val line = new graft.queryengine.LineQuery(
      graft.schema.FlowSchema.schema, store.tables())
    val rows = line.build(spark, graft.queryengine.LineInput(
      start = start, end = end, points = 6,
      dimensions = Seq("ExporterName"), limit = 5, unit = "l3bps")).collect()
    val total = rows.map(r => math.round(r.getAs[Double]("xps") * 600)).sum
    assert(total == 3 * 5848L * 30000L * 8L)
  }

  test("recovery re-delivers the uncommitted batch WITH its rows; " +
      "commit markers keep the fan-out exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("soak-replay").toString
    val checkpoint = s"$root/_checkpoint"
    def ts(s: String) = Timestamp.from(Instant.parse(s))

    // a replayable source (unlike UDP, MemoryStream re-plans a stale
    // range with the SAME rows — the worst case for the fan-out)
    val mem = MemoryStream[(Timestamp, Long, Long, Long)]
    val stream = mem.toDF()
      .toDF("TimeReceived", "Bytes", "Packets", "SamplingRate")
      .withColumn("ExporterAddress", lit(Ip.parse("10.0.0.1")))
      .withColumn("ExporterName", lit("edge1"))
      .withColumn("InIfName", lit("eth0"))
      .withColumn("OutIfName", lit("eth1"))
      .withColumn("InIfDescription", lit("u"))
      .withColumn("OutIfDescription", lit("d"))
      .withColumn("InIfSpeed", lit(1000L)).withColumn("OutIfSpeed", lit(1000L))
      .withColumn("InIfConnectivity", lit("t"))
      .withColumn("OutIfConnectivity", lit("p"))
      .withColumn("InIfProvider", lit("p1"))
      .withColumn("OutIfProvider", lit("p2"))
      .withColumn("InIfBoundary", lit("external"))
      .withColumn("OutIfBoundary", lit("internal"))

    def startIngest(): StreamingQuery =
      FlowIngest.start(stream, new FlowStore(spark, root),
        checkpoint = checkpoint, trigger = Trigger.ProcessingTime(0L))

    val q1 = startIngest()
    mem.addData((ts("2024-03-01T00:00:10Z"), 100L, 2L, 1000L))
    q1.processAllAvailable()
    mem.addData((ts("2024-03-01T00:01:10Z"), 200L, 3L, 1000L),
      (ts("2024-03-01T00:06:10Z"), 400L, 5L, 1000L))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(s"$root/flows").count() == 3)

    // crash between the fan-out and the checkpoint commit
    dropNewestCommit(checkpoint)

    val q2 = startIngest()
    q2.processAllAvailable() // replays the batch with its original rows
    mem.addData((ts("2024-03-01T00:07:10Z"), 800L, 7L, 1000L))
    q2.processAllAvailable()

    // ---- late data past any watermark horizon (§4.3): a row for the
    // FIRST minute arrives after the restart, batches later — the
    // reference's SummingMergeTree merges it silently; the merge-on-read
    // path must do the same, in every resolution, in its TRUE bucket
    mem.addData((ts("2024-03-01T00:00:50Z"), 64L, 1L, 1000L))
    q2.processAllAvailable()
    q2.stop()

    val flows = spark.read.parquet(s"$root/flows")
    assert(flows.count() == 5, "replayed batch must not append twice")
    assert(bytesOf(root, "flows") == 1564L)
    for (t <- Seq("flows_1m", "flows_5m", "flows_1h"))
      assert(bytesOf(root, t) == 1564L,
        s"$t lost or double-counted the replayed batch or the late row")
    // the late row's bytes re-aggregate into the bucket its EVENT TIME
    // names, not an arrival-time bucket: minute 00:00 now sums 100+64
    def bucketBytes(t: String, resSec: Long, bucket: String): Long =
      spark.read.parquet(s"$root/$t")
        .groupBy(window(col("TimeReceived"), s"$resSec seconds"))
        .agg(sum("Bytes").as("b"))
        .where(col("window.start") === ts(bucket))
        .collect()(0).getAs[Long]("b")
    assert(bucketBytes("flows_1m", 60L, "2024-03-01T00:00:00Z") == 164L,
      "late row missing from its true 1m bucket under merge-on-read")
    assert(bucketBytes("flows_5m", 300L, "2024-03-01T00:00:00Z") == 364L,
      "late row missing from its true 5m bucket under merge-on-read")
    assert(bucketBytes("flows_1h", 3600L, "2024-03-01T00:00:00Z") == 1564L,
      "late row missing from its true 1h bucket under merge-on-read")
    // every table's marker reached the final batch id
    val store = new FlowStore(spark, root)
    val marks = Seq("flows", "flows_1m", "flows_5m", "flows_1h", "exporters")
      .map(store.lastCommitted).toSet
    assert(marks.size == 1 && marks.head >= 2L,
      s"per-table commit markers diverged: $marks")
  }
}
