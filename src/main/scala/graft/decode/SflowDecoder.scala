package graft.decode

import scala.collection.mutable.ArrayBuffer

/** sFlow v5 datagram decoder (SURVEY §2.8 I2; wire format per the public
  * sFlow v5 specification, XDR-encoded). Flow-message mapping follows
  * reference `outlet/flow/decoder/sflow/decode.go:60-245`: flow samples and
  * expanded flow samples; raw-header, sampled-IPv4/IPv6, sampled-Ethernet,
  * extended-switch/router/gateway records; discard-reason → IPFIX
  * forwarding status; 0x3fffffff local-interface translation.
  *
  * Stateless (sFlow needs no templates), so the Spark integration is a
  * plain `flatMap`.
  */
object SflowDecoder {

  private val InterfaceLocal = 0x3fffffffL
  private val FormatIfIndex = 0L
  private val FormatDiscard = 1L
  private val FormatMultiple = 2L

  /** sFlow drop-reason → IPFIX ForwardingStatus (RFC 7270 §4.12), reference
    * `sflow/decode.go:37-58`.
    */
  private val discardToForwardingStatus: Map[Long, Long] = Map(
    0L -> 131L, 1L -> 131L, 2L -> 131L, 3L -> 131L, 4L -> 133L, 5L -> 131L,
    6L -> 131L, 7L -> 131L, 8L -> 132L, 9L -> 129L, 10L -> 129L,
    257L -> 137L, 258L -> 130L, 259L -> 143L, 260L -> 139L, 261L -> 138L,
    262L -> 135L, 263L -> 131L, 269L -> 130L, 302L -> 140L)

  final case class Result(flows: Seq[DecodedFlow], error: Option[String])

  /** Malformed datagrams become errors, never task failures (the
    * equivalent of the reference's decoder panic recovery,
    * `outlet/flow/decoder.go:60-71`).
    */
  def decode(payload: Array[Byte], tsReceived: Long,
      options: DecodeOptions): Result =
    try decodeUnsafe(payload, tsReceived, options)
    catch {
      case _: ArrayIndexOutOfBoundsException | _: IndexOutOfBoundsException |
           _: NegativeArraySizeException =>
        Result(Nil, Some("malformed datagram"))
    }

  private def decodeUnsafe(payload: Array[Byte], tsReceived: Long,
      options: DecodeOptions): Result = {
    val w = new Wire(payload)
    if (!w.hasBytes(28)) return Result(Nil, Some("payload too small"))
    val version = w.u32()
    if (version != 5) return Result(Nil, Some(s"unsupported sFlow version $version"))
    val agentIp = readAddress(w)
    if (agentIp == null) return Result(Nil, Some("bad agent address"))
    w.skip(4) // sub-agent id
    w.skip(4) // sequence number
    w.skip(4) // uptime
    val sampleCount = w.u32()

    val out = ArrayBuffer.empty[DecodedFlow]
    val bf = new FlowBuilder(out += _)
    val needDecap = options.decap != PacketParse.DecapNone

    var s = 0L
    while (s < sampleCount && w.hasBytes(8)) {
      val sampleType = w.u32()
      val sampleLen = w.u32().toInt
      if (!w.hasBytes(sampleLen)) return Result(out.toSeq, Some("truncated sample"))
      val sw = w.slice(sampleLen)
      val enterprise = sampleType >> 12
      val format = sampleType & 0xfff
      if (enterprise == 0 && (format == 1 || format == 3)) {
        decodeFlowSample(sw, expanded = format == 3, agentIp, tsReceived,
          needDecap, options, bf)
      }
      s += 1
    }
    Result(out.toSeq, None)
  }

  /** address type (1 = IPv4, 2 = IPv6) + bytes, canonicalized to 16. */
  private def readAddress(w: Wire): Array[Byte] = w.u32() match {
    case 1 if w.hasBytes(4) => Addr.to16(w.take(4))
    case 2 if w.hasBytes(16) => w.take(16)
    case _ => null
  }

  private def decodeFlowSample(w: Wire, expanded: Boolean, agentIp: Array[Byte],
      tsReceived: Long, needDecap: Boolean, options: DecodeOptions,
      bf: FlowBuilder): Unit = {
    if (!w.hasBytes(if (expanded) 44 else 32)) return
    w.skip(4) // sequence number
    var samplingRate = 0L
    var forwardingStatus = 0L
    if (!expanded) {
      w.skip(4) // source id
      samplingRate = w.u32()
      w.skip(8) // sample pool + drops
      val input = w.u32()
      val output = w.u32()
      input >> 30 match {
        case FormatIfIndex => bf.inIf = input
        case _ => ()
      }
      output >> 30 match {
        case FormatIfIndex => bf.outIf = output
        case FormatDiscard =>
          val reason = output & 0x3fffffff
          forwardingStatus = discardToForwardingStatus.getOrElse(reason, 128L)
        case _ => ()
      }
    } else {
      w.skip(8) // source id type + value
      samplingRate = w.u32()
      w.skip(8) // sample pool + drops
      val inputFormat = w.u32(); val inputValue = w.u32()
      val outputFormat = w.u32(); val outputValue = w.u32()
      if (inputFormat == FormatIfIndex) bf.inIf = inputValue
      outputFormat match {
        case FormatIfIndex => bf.outIf = outputValue
        case FormatDiscard =>
          forwardingStatus = discardToForwardingStatus.getOrElse(outputValue, 128L)
        case _ => ()
      }
    }
    bf.samplingRate = samplingRate
    if (bf.inIf == InterfaceLocal) bf.inIf = 0
    if (bf.outIf == InterfaceLocal) bf.outIf = 0

    val recordCount = w.u32()
    // collect records first (decode.go:103-120 pre-scans record kinds)
    val records = ArrayBuffer.empty[(Long, Array[Byte])]
    var r = 0L
    while (r < recordCount && w.hasBytes(8)) {
      val dataFormat = w.u32()
      val len = w.u32().toInt
      if (!w.hasBytes(len)) { bf.clear(); return }
      records += ((dataFormat & 0xfff, w.take(len)))
      r += 1
    }
    var l3Length = 0L
    records.foreach { case (format, body) =>
      val rw = new Wire(body)
      format match {
        case 1 => // raw sampled header
          // header is processed unless IP data is already present and no
          // L2/L3L4/decap need — we always keep full columns, so parse it
          if (rw.hasBytes(16)) {
            val protocol = rw.u32()
            rw.skip(4) // frame length
            rw.skip(4) // stripped
            val headerLen = rw.u32().toInt
            val header = rw.take(math.min(headerLen, rw.remaining))
            val l = protocol match {
              case 1 => PacketParse.parseEthernet(bf, options.decap, header, 0)
              case 11 => PacketParse.parseIPv4(bf, options.decap, header, 0)
              case 12 => PacketParse.parseIPv6(bf, options.decap, header, 0)
              case _ => 0L
            }
            if (l > 0) l3Length = l
          }
        case 3 if !needDecap => // sampled IPv4
          if (rw.hasBytes(32)) {
            l3Length = rw.u32()
            val protocol = rw.u32()
            bf.srcAddr = Addr.to16(rw.take(4))
            bf.dstAddr = Addr.to16(rw.take(4))
            val srcPort = rw.u32(); val dstPort = rw.u32()
            rw.skip(4) // tcp flags
            val tos = rw.u32()
            bf.appendUint(Col.Proto, protocol)
            bf.appendUint(Col.SrcPort, srcPort)
            bf.appendUint(Col.DstPort, dstPort)
            bf.appendUint(Col.EType, PacketParse.ETypeIPv4)
            bf.appendUint(Col.IPTos, tos)
          }
        case 4 if !needDecap => // sampled IPv6
          if (rw.hasBytes(56)) {
            l3Length = rw.u32()
            val protocol = rw.u32()
            bf.srcAddr = rw.take(16)
            bf.dstAddr = rw.take(16)
            val srcPort = rw.u32(); val dstPort = rw.u32()
            rw.skip(4) // tcp flags
            val priority = rw.u32()
            bf.appendUint(Col.Proto, protocol)
            bf.appendUint(Col.SrcPort, srcPort)
            bf.appendUint(Col.DstPort, dstPort)
            bf.appendUint(Col.EType, PacketParse.ETypeIPv6)
            bf.appendUint(Col.IPTos, priority)
          }
        case 2 if !needDecap => // sampled ethernet
          if (rw.hasBytes(24)) {
            val frameLength = rw.u32()
            if (l3Length == 0) l3Length = frameLength - 16
            val srcMac = Wire.uNumber(rw.take(6)); rw.skip(2)
            val dstMac = Wire.uNumber(rw.take(6)); rw.skip(2)
            bf.appendUint(Col.SrcMAC, srcMac)
            bf.appendUint(Col.DstMAC, dstMac)
          }
        case 1001 if !needDecap => // extended switch
          if (rw.hasBytes(16)) {
            val srcVlan = rw.u32(); rw.skip(4)
            val dstVlan = rw.u32()
            if (srcVlan < 4096) bf.srcVlan = srcVlan.toInt
            if (dstVlan < 4096) bf.dstVlan = dstVlan.toInt
          }
        case 1002 if !needDecap => // extended router
          val nextHop = readAddress(rw)
          if (nextHop != null && rw.hasBytes(8)) {
            bf.nextHop = nextHop
            bf.srcNetMask = rw.u32().toInt
            bf.dstNetMask = rw.u32().toInt
          }
        case 1003 if !needDecap => // extended gateway
          val nextHop = readAddress(rw)
          if (nextHop != null && rw.hasBytes(12)) {
            bf.nextHop = nextHop
            val as = rw.u32()
            val srcAs = rw.u32()
            rw.skip(4) // src peer AS
            bf.srcAS = if (srcAs > 0) srcAs else as
            bf.dstAS = as
            // AS path segments, flattened
            val asPath = ArrayBuffer.empty[Long]
            if (rw.hasBytes(4)) {
              val segCount = rw.u32()
              var seg = 0L
              var ok = true
              while (seg < segCount && ok) {
                if (rw.hasBytes(8)) {
                  rw.skip(4) // path segment type
                  val n = rw.u32()
                  var i = 0L
                  while (i < n && rw.hasBytes(4)) { asPath += rw.u32(); i += 1 }
                } else ok = false
                seg += 1
              }
            }
            if (asPath.nonEmpty) {
              bf.dstAS = asPath.last
              bf.appendArray(Col.DstASPath, asPath.toSeq)
            }
            if (rw.hasBytes(4)) {
              val commCount = rw.u32()
              val comms = ArrayBuffer.empty[Long]
              var i = 0L
              while (i < commCount && rw.hasBytes(4)) { comms += rw.u32(); i += 1 }
              if (comms.nonEmpty) bf.appendArray(Col.DstCommunities, comms.toSeq)
            }
          }
        case _ => ()
      }
    }

    if (l3Length > 0) bf.appendUint(Col.Bytes, l3Length)
    else if (needDecap) { bf.clear(); return } // non-encapsulated packet

    bf.exporterAddress = agentIp
    bf.timeReceived = tsReceived
    bf.appendUint(Col.Packets, 1)
    bf.appendUint(Col.ForwardingStatus, forwardingStatus)
    bf.finalizeRecord()
  }
}
