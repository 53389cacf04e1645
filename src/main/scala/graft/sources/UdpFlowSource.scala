package graft.sources

import java.net.{InetSocketAddress, StandardSocketOptions}
import java.nio.ByteBuffer
import java.nio.channels.{ClosedChannelException, DatagramChannel}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.decode.{DecodeOptions, RawFlow}

/** UDP flow inlet (SURVEY §2 S1; reference `inlet/flow/input/udp/root.go:
  * 79-150`): a DataSource V2 micro-batch streaming source that binds a
  * datagram socket, stamps every received datagram as a RawFlow envelope
  * exactly like the reference worker loop — `TimeReceived = now`,
  * `Payload = datagram`, `SourceAddress = sender IP (16-byte form)` — and
  * emits `(exporter, seq, data)` rows matching
  * [[graft.decode.DecodePipeline.RawEnvelope]], so
  * `spark.readStream.format("graft-udp").load().as[RawEnvelope]` feeds
  * straight into `DecodePipeline.decode`.
  *
  * Options:
  *  - `host` (default 127.0.0.1) / `port` (default 0 = ephemeral)
  *  - `workers` (default 1): listener sockets on the same port via
  *    SO_REUSEPORT, kernel-load-balanced — the reference's worker pool
  *    (`root.go:118-144`). Cross-worker arrival order is absorbed by the
  *    decode stage's reorder window, as on the reference's Kafka path.
  *  - `name`: registry key — [[UdpFlowSource.boundPort]] reports the bound
  *    ephemeral port so a test or operator can aim exporters at it
  *  - `decoder`: `netflow` (default) or `sflow`
  *  - `timestampSource`: `input` (default) | `netflow-packet` |
  *    `netflow-first-switched` — forwarded into the envelope for the
  *    decoder's timestamp selection (I3)
  *  - `receiveBuffer`: SO_RCVBUF request in bytes (0 = system default);
  *    like the reference, a kernel cap is tolerated silently
  *  - `maxDatagramBytes` (default 9000): read buffer size, the reference's
  *    jumbo-frame payload bound
  *  - `maxBufferedDatagrams` (default 1M): driver-side buffer bound — a
  *    stalled query drops incoming datagrams (counted) past this, like
  *    the kernel queue (`in_dropped_packets_total`)
  *
  * Delivery contract: UDP is fire-and-forget — datagrams arriving while no
  * query is running, or beyond the committed offset at a crash, are lost
  * (kernel-drop semantics, `in_dropped_packets_total` in the reference).
  * The durable hand-off the reference gets from Kafka belongs to the sink
  * side of this source; a restart re-binds the socket and starts a fresh
  * sequence. This mirrors `TextSocketMicroBatchStream`'s documented
  * non-replayability and is exactly the reference inlet's guarantee.
  *
  * Scale shape: `workers` SO_REUSEPORT sockets scale one listener across
  * cores (the reference's `Workers: N`); beyond one host, deploy one
  * source per executor host behind an UDP load balancer. The decode
  * stage's group-by-exporter shuffle is unaffected by how many listeners
  * fed it.
  */
final class UdpFlowSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-udp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UdpFlowSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new UdpTable(new CaseInsensitiveStringMap(properties))
}

object UdpFlowSource {
  /** Row shape = [[graft.decode.DecodePipeline.RawEnvelope]]. */
  val schema: StructType = StructType(Seq(
    StructField("exporter", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))

  private val ports = new ConcurrentHashMap[String, Integer]()
  private val streams = new ConcurrentHashMap[String, UdpMicroBatchStream]()

  /** The bound port of the named running source (None until its streaming
    * query has started and bound the socket).
    */
  def boundPort(name: String): Option[Int] = Option(ports.get(name)).map(_.intValue)

  /** Listener counters (reference `bytes_total`/`packets_total`/
    * `errors_total`/`in_dropped_packets_total` analogues). */
  final case class Stats(packets: Long, bytes: Long, errors: Long,
      dropped: Long, buffered: Int)

  /** Live counters of the named running source. */
  def stats(name: String): Option[Stats] =
    Option(streams.get(name)).map(_.statsSnapshot)

  private[sources] def register(name: String, port: Int,
      stream: UdpMicroBatchStream): Unit =
    if (name.nonEmpty) { ports.put(name, port); streams.put(name, stream) }
  private[sources] def unregister(name: String): Unit =
    if (name.nonEmpty) { ports.remove(name); streams.remove(name) }

  private[sources] def parseDecoder(s: String): Int = s.toLowerCase match {
    case "" | "netflow" => RawFlow.DecoderNetflow
    case "sflow" => RawFlow.DecoderSflow
    case other => throw new IllegalArgumentException(s"unknown decoder '$other'")
  }

  private[sources] def parseTimestampSource(s: String): Int = s.toLowerCase match {
    case "" | "input" => DecodeOptions.TsInput
    case "netflow-packet" => DecodeOptions.TsNetflowPacket
    case "netflow-first-switched" => DecodeOptions.TsNetflowFirstSwitched
    case other => throw new IllegalArgumentException(s"unknown timestampSource '$other'")
  }
}

private[sources] final class UdpTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-udp(${options.getOrDefault("name", "")})"
  override def schema(): StructType = UdpFlowSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UdpFlowSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new UdpMicroBatchStream(options)
      }
    }
}

/** Datagram count as the stream position: offset N = "N datagrams
  * received since this socket bound".
  */
private[sources] final case class UdpOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] final class UdpMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private val host = options.getOrDefault("host", "127.0.0.1")
  private val port = options.getOrDefault("port", "0").toInt
  private val workers = options.getOrDefault("workers", "1").toInt.max(1)
  private val sourceName = options.getOrDefault("name", "")
  private val decoder = UdpFlowSource.parseDecoder(options.getOrDefault("decoder", ""))
  private val tsSource =
    UdpFlowSource.parseTimestampSource(options.getOrDefault("timestampSource", ""))
  private val receiveBuffer = options.getOrDefault("receiveBuffer", "0").toInt
  private val maxDatagram = options.getOrDefault("maxDatagramBytes", "9000").toInt

  // receive state: the worker thread appends; planInputPartitions slices;
  // commit trims. `buffer(i)` holds the envelope with seq = trimmedTo + i.
  // Offsets are monotone across restarts: deserializeOffset fast-forwards
  // a fresh socket's numbering to the restored checkpoint (see below).
  private val lock = new Object
  private val buffer = ArrayBuffer.empty[(String, Long, Array[Byte])]
  private var trimmedTo = 0L
  private val received = new AtomicLong(0L)
  private val stopped = new AtomicBoolean(false)
  private val maxBuffered = options.getOrDefault("maxBufferedDatagrams",
    "1000000").toInt

  // per-cause counters, the reference's packets/bytes/errors/inDrops metrics
  val packets = new AtomicLong(0L)
  val bytes = new AtomicLong(0L)
  val errors = new AtomicLong(0L)
  val dropped = new AtomicLong(0L) // buffer-full drops (in_dropped analogue)

  /** `workers` sockets on ONE port via SO_REUSEPORT — the reference's
    * worker pool (`root.go:118-144`: N ListenPacket calls on the same
    * address, kernel-load-balanced). The first bind resolves an ephemeral
    * port; the rest join it.
    */
  private val channels: Seq[DatagramChannel] = {
    def open(p: Int): DatagramChannel = {
      val ch = DatagramChannel.open()
      if (receiveBuffer > 0) {
        // above net.core.rmem_max the kernel caps silently — same tolerance
        // as the reference's SetReadBuffer warning path
        try ch.setOption[Integer](StandardSocketOptions.SO_RCVBUF, receiveBuffer)
        catch { case _: Exception => () }
      }
      if (workers > 1)
        ch.setOption[java.lang.Boolean](StandardSocketOptions.SO_REUSEPORT, true)
      ch.bind(new InetSocketAddress(host, p))
      ch
    }
    val first = open(port)
    val boundP = first.getLocalAddress.asInstanceOf[InetSocketAddress].getPort
    first +: (1 until workers).map(_ => open(boundP))
  }
  UdpFlowSource.register(sourceName,
    channels.head.getLocalAddress.asInstanceOf[InetSocketAddress].getPort, this)

  private[sources] def statsSnapshot: UdpFlowSource.Stats =
    UdpFlowSource.Stats(packets.get(), bytes.get(), errors.get(),
      dropped.get(), lock.synchronized(buffer.length))

  private val workerThreads = channels.zipWithIndex.map { case (ch, i) =>
    val t = new Thread(() => receiveLoop(ch), s"graft-udp-$sourceName-$i")
    t.setDaemon(true)
    t.start()
    t
  }

  /** The reference worker loop (`root.go:202-241`): read, stamp, enqueue.
    * One thread per worker socket; all workers share the buffer and the
    * receive sequence (appends are serialized under the buffer lock, the
    * same contention point the reference's single `send` channel has).
    */
  private def receiveLoop(channel: DatagramChannel): Unit = {
    val buf = ByteBuffer.allocate(maxDatagram)
    while (!stopped.get()) {
      try {
        buf.clear()
        val src = channel.receive(buf).asInstanceOf[InetSocketAddress]
        if (src != null) {
          buf.flip()
          val payload = new Array[Byte](buf.remaining())
          buf.get(payload)
          val addr = graft.decode.Addr.to16(src.getAddress.getAddress)
          // flow.TimeReceived = now; Payload; SourceAddress (root.go:230-233)
          val env = RawFlow.encode(RawFlow(
            timeReceived = System.currentTimeMillis() / 1000L,
            payload = payload,
            sourceAddress = addr,
            decoder = decoder,
            timestampSource = tsSource))
          val exporter = addr.map(b => f"${b & 0xff}%02x").mkString
          val kept = lock.synchronized {
            // bounded like the kernel socket queue: a stalled or slow
            // query drops incoming datagrams (counted) instead of growing
            // the driver heap without limit
            if (buffer.length >= maxBuffered) false
            else {
              val seq = received.get()
              buffer += ((exporter, seq, env))
              received.incrementAndGet()
              true
            }
          }
          if (kept) {
            packets.incrementAndGet()
            bytes.addAndGet(payload.length.toLong)
          } else dropped.incrementAndGet()
        }
      } catch {
        case _: ClosedChannelException => return
        case _: InterruptedException => return
        case _ if stopped.get() => return
        case _: Exception => errors.incrementAndGet()
      }
    }
  }

  override def initialOffset(): Offset = UdpOffset(0L)
  override def latestOffset(): Offset = UdpOffset(received.get())

  /** Restart recovery: offsets in the checkpoint were minted by a PREVIOUS
    * socket's numbering. Fast-forward this socket past any restored offset
    * so (a) new datagrams are numbered after the checkpoint — without this
    * the first `restoredOffset` live datagrams would silently alias the
    * committed range and never be emitted — and (b) a replayed
    * `commit(restored)` cannot trim more rows than the buffer holds.
    * Datagrams received in the bind-to-recovery window are dropped and
    * counted (UDP fire-and-forget, same as the pre-rebind loss).
    */
  override def deserializeOffset(json: String): Offset = {
    val v = json.toLong
    lock.synchronized {
      if (v > trimmedTo + buffer.length) {
        dropped.addAndGet(buffer.length.toLong)
        buffer.clear()
        trimmedTo = v
        received.set(v)
      }
    }
    UdpOffset(v)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[UdpOffset].n
    val e = end.asInstanceOf[UdpOffset].n
    val rows = lock.synchronized {
      // a restarted query's checkpoint can point past this socket's life;
      // everything before the rebind is gone (UDP kernel-drop semantics)
      val from = math.max(s, trimmedTo)
      if (from >= e) Array.empty[(String, Long, Array[Byte])]
      else buffer.slice((from - trimmedTo).toInt, (e - trimmedTo).toInt).toArray
    }
    if (rows.isEmpty) Array.empty
    else Array(UdpInputPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[UdpInputPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val (exporter, seq, data) = rows(i)
          new GenericInternalRow(
            Array[Any](UTF8String.fromString(exporter), seq, data))
        }
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[UdpOffset].n
    lock.synchronized {
      if (e > trimmedTo) {
        // clamp: a replayed commit from a previous socket's checkpoint can
        // exceed what this socket has buffered
        buffer.remove(0, math.min(e - trimmedTo, buffer.length.toLong).toInt)
        trimmedTo = e
      }
    }
  }

  override def stop(): Unit = {
    stopped.set(true)
    UdpFlowSource.unregister(sourceName)
    channels.foreach(ch => try ch.close() catch { case _: Exception => () })
  }
}

private[sources] final case class UdpInputPartition(
    rows: Array[(String, Long, Array[Byte])]) extends InputPartition
