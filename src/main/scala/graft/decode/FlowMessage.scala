package graft.decode

/** One decoded flow record — the ingest contract of the engine (SURVEY
  * §2.8): every field of the reference's `schema.FlowMessage`
  * (`common/schema/message.go:23-58`) that the NetFlow/sFlow decoders can
  * produce. Addresses are canonical 16-byte (IPv4 as v4-mapped IPv6),
  * `null` when absent; numeric fields default to 0; arrays to empty.
  */
final case class DecodedFlow(
    TimeReceived: Long,
    SamplingRate: Long,
    ExporterAddress: Array[Byte],
    InIf: Long,
    OutIf: Long,
    SrcAddr: Array[Byte],
    DstAddr: Array[Byte],
    NextHop: Array[Byte],
    SrcNetMask: Int,
    DstNetMask: Int,
    SrcAS: Long,
    DstAS: Long,
    SrcVlan: Int,
    DstVlan: Int,
    Bytes: Long,
    Packets: Long,
    EType: Long,
    Proto: Long,
    SrcPort: Int,
    DstPort: Int,
    ForwardingStatus: Long,
    FlowDirection: Int,
    TCPFlags: Int,
    IPTos: Int,
    IPTTL: Int,
    IPFragmentID: Long,
    IPFragmentOffset: Int,
    IPv6FlowLabel: Long,
    ICMPv4Type: Int,
    ICMPv4Code: Int,
    ICMPv6Type: Int,
    ICMPv6Code: Int,
    SrcMAC: Long,
    DstMAC: Long,
    MPLSLabels: Seq[Long],
    DstASPath: Seq[Long],
    DstCommunities: Seq[Long],
    SrcAddrNAT: Array[Byte],
    DstAddrNAT: Array[Byte],
    SrcPortNAT: Int,
    DstPortNAT: Int,
    IngressVRFID: Long,
    EgressVRFID: Long)

/** Column keys for the append-by-key surface of [[FlowBuilder]] — mirrors
  * the reference's `schema.ColumnKey` constants used by the decoders.
  */
object Col {
  val Bytes = "Bytes"
  val Packets = "Packets"
  val EType = "EType"
  val Proto = "Proto"
  val SrcPort = "SrcPort"
  val DstPort = "DstPort"
  val ForwardingStatus = "ForwardingStatus"
  val FlowDirection = "FlowDirection"
  val TCPFlags = "TCPFlags"
  val IPTos = "IPTos"
  val IPTTL = "IPTTL"
  val IPFragmentID = "IPFragmentID"
  val IPFragmentOffset = "IPFragmentOffset"
  val IPv6FlowLabel = "IPv6FlowLabel"
  val ICMPv4Type = "ICMPv4Type"
  val ICMPv4Code = "ICMPv4Code"
  val ICMPv6Type = "ICMPv6Type"
  val ICMPv6Code = "ICMPv6Code"
  val SrcMAC = "SrcMAC"
  val DstMAC = "DstMAC"
  val MPLSLabels = "MPLSLabels"
  val DstASPath = "DstASPath"
  val DstCommunities = "DstCommunities"
  val SrcAddrNAT = "SrcAddrNAT"
  val DstAddrNAT = "DstAddrNAT"
  val SrcPortNAT = "SrcPortNAT"
  val DstPortNAT = "DstPortNAT"
  val IngressVRFID = "IngressVRFID"
  val EgressVRFID = "EgressVRFID"

  /** Direction twin of an appendable column (reference
    * `common/schema/message.go` ReverseColumnDirection).
    */
  def reverse(name: String): String =
    if (name.startsWith("Src")) "Dst" + name.substring(3)
    else if (name.startsWith("Dst")) "Src" + name.substring(3)
    else name
}

/** Mutable builder with the reference `FlowMessage` mutation semantics
  * (`common/schema/clickhouse.go:155-258,346-405`, `message.go:145-152`):
  *
  *  - appends skip zero/empty values and are first-write-wins per column;
  *  - [[reverse]] swaps the direct direction fields AND redirects
  *    subsequent appends to the column's direction twin (RFC 5103 biflows);
  *  - [[undo]] discards the in-progress record;
  *  - [[finalizeRecord]] snapshots to an immutable [[DecodedFlow]] and
  *    clears, mirroring the worker's finalize-then-Clear loop
  *    (`outlet/core/worker.go:70-137`).
  */
final class FlowBuilder(sink: DecodedFlow => Unit) {
  var timeReceived: Long = 0L
  var samplingRate: Long = 0L
  var exporterAddress: Array[Byte] = null
  var inIf: Long = 0L
  var outIf: Long = 0L
  var srcAddr: Array[Byte] = null
  var dstAddr: Array[Byte] = null
  var nextHop: Array[Byte] = null
  var srcNetMask: Int = 0
  var dstNetMask: Int = 0
  var srcAS: Long = 0L
  var dstAS: Long = 0L
  var srcVlan: Int = 0
  var dstVlan: Int = 0
  private var reversed = false
  private val appended = scala.collection.mutable.HashMap.empty[String, Any]

  def reverse(): Unit = {
    reversed = !reversed
    val i = inIf; inIf = outIf; outIf = i
    val v = srcVlan; srcVlan = dstVlan; dstVlan = v
    val a = srcAddr; srcAddr = dstAddr; dstAddr = a
    val s = srcAS; srcAS = dstAS; dstAS = s
    val m = srcNetMask; srcNetMask = dstNetMask; dstNetMask = m
  }

  private def key(name: String): String = if (reversed) Col.reverse(name) else name

  def appendUint(name: String, value: Long): Unit = {
    val k = key(name)
    if (value != 0 && !appended.contains(k)) appended(k) = value
  }

  def appendIp(name: String, value: Array[Byte]): Unit = {
    val k = key(name)
    if (value != null && !appended.contains(k)) appended(k) = value
  }

  def appendArray(name: String, value: Seq[Long]): Unit = {
    val k = key(name)
    if (value.nonEmpty && !appended.contains(k)) appended(k) = value
  }

  /** Discard the in-progress record (reference `Undo`). */
  def undo(): Unit = clear()

  def clear(): Unit = {
    timeReceived = 0L; samplingRate = 0L; exporterAddress = null
    inIf = 0L; outIf = 0L
    srcAddr = null; dstAddr = null; nextHop = null
    srcNetMask = 0; dstNetMask = 0; srcAS = 0L; dstAS = 0L
    srcVlan = 0; dstVlan = 0
    reversed = false
    appended.clear()
  }

  private def gl(n: String): Long = appended.get(n).fold(0L)(_.asInstanceOf[Long])
  private def gi(n: String): Int = gl(n).toInt
  private def gb(n: String): Array[Byte] =
    appended.get(n).fold(null: Array[Byte])(_.asInstanceOf[Array[Byte]])
  private def ga(n: String): Seq[Long] =
    appended.get(n).fold(Seq.empty[Long])(_.asInstanceOf[Seq[Long]])

  /** Snapshot + clear; the record lands in the decoder's output sink. */
  def finalizeRecord(): Unit = {
    sink(DecodedFlow(
      TimeReceived = timeReceived,
      SamplingRate = samplingRate,
      ExporterAddress = exporterAddress,
      InIf = inIf, OutIf = outIf,
      SrcAddr = srcAddr, DstAddr = dstAddr, NextHop = nextHop,
      SrcNetMask = srcNetMask, DstNetMask = dstNetMask,
      SrcAS = srcAS, DstAS = dstAS,
      SrcVlan = srcVlan, DstVlan = dstVlan,
      Bytes = gl(Col.Bytes), Packets = gl(Col.Packets),
      EType = gl(Col.EType), Proto = gl(Col.Proto),
      SrcPort = gi(Col.SrcPort), DstPort = gi(Col.DstPort),
      ForwardingStatus = gl(Col.ForwardingStatus),
      FlowDirection = gi(Col.FlowDirection),
      TCPFlags = gi(Col.TCPFlags), IPTos = gi(Col.IPTos), IPTTL = gi(Col.IPTTL),
      IPFragmentID = gl(Col.IPFragmentID),
      IPFragmentOffset = gi(Col.IPFragmentOffset),
      IPv6FlowLabel = gl(Col.IPv6FlowLabel),
      ICMPv4Type = gi(Col.ICMPv4Type), ICMPv4Code = gi(Col.ICMPv4Code),
      ICMPv6Type = gi(Col.ICMPv6Type), ICMPv6Code = gi(Col.ICMPv6Code),
      SrcMAC = gl(Col.SrcMAC), DstMAC = gl(Col.DstMAC),
      MPLSLabels = ga(Col.MPLSLabels),
      DstASPath = ga(Col.DstASPath),
      DstCommunities = ga(Col.DstCommunities),
      SrcAddrNAT = gb(Col.SrcAddrNAT), DstAddrNAT = gb(Col.DstAddrNAT),
      SrcPortNAT = gi(Col.SrcPortNAT), DstPortNAT = gi(Col.DstPortNAT),
      IngressVRFID = gl(Col.IngressVRFID), EgressVRFID = gl(Col.EgressVRFID)))
    clear()
  }
}

object Addr {
  /** v4 bytes → canonical v4-mapped 16 bytes; 16 bytes pass through
    * (reference `outlet/flow/decoder/helpers.go:306-311` DecodeIP).
    */
  def to16(b: Array[Byte]): Array[Byte] =
    if (b == null) null
    else if (b.length == 16) b
    else if (b.length == 4) {
      val out = new Array[Byte](16)
      out(10) = -1; out(11) = -1
      System.arraycopy(b, 0, out, 12, 4)
      out
    } else null

  def fromUint32(v: Long): Array[Byte] = {
    val out = new Array[Byte](16)
    out(10) = -1; out(11) = -1
    out(12) = ((v >> 24) & 0xff).toByte
    out(13) = ((v >> 16) & 0xff).toByte
    out(14) = ((v >> 8) & 0xff).toByte
    out(15) = (v & 0xff).toByte
    out
  }
}
