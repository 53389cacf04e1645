package graft.decode

import scala.collection.mutable.ArrayBuffer

/** Decode options carried by the RawFlow envelope
  * (`common/pb/rawflow.proto:22-33`).
  */
final case class DecodeOptions(
    timestampSource: Int = DecodeOptions.TsInput,
    decap: PacketParse.Decap = PacketParse.DecapNone)

object DecodeOptions {
  val TsInput = 0
  val TsNetflowPacket = 1
  val TsNetflowFirstSwitched = 2
}

/** NetFlow v5 / v9 / IPFIX datagram decoder (SURVEY §2.8 I2). Wire layout
  * per RFC 3954 / RFC 7011; flow-message mapping per reference
  * `outlet/flow/decoder/netflow/decode.go:38-408` and `root.go:93-216`:
  * option-data sampling rates, RFC 5103 biflow splitting, the Juniper
  * forwarding-exception PEN, ICMP type/code heuristics, MPLS stacks, and
  * the three timestamp sources.
  *
  * Pure function of (payload, state): returns the updated [[TemplateState]]
  * and the decoded flows, so it drops into `flatMapGroupsWithState`
  * unchanged — the state store carries per-exporter templates.
  */
object NetflowDecoder {

  /** One wire field value of a data record. */
  private final case class DataField(ftype: Int, pen: Long, value: Array[Byte])

  private val ReversePen = 29305L // RFC 5103 reverse-direction PEN
  private val JuniperPen = 2636L

  final case class Result(state: TemplateState, flows: Seq[DecodedFlow],
      error: Option[String], templatesMissing: Boolean,
      nonEncapDrops: Long = 0L)

  /** Decode one datagram. `tsReceived` is epoch seconds of reception;
    * `sourceAddr` the canonical 16-byte exporter source.
    *
    * A malformed datagram must never fail the task (after retries, the
    * whole ingest query): any out-of-bounds walk becomes a decode error,
    * the moral equivalent of the reference's panic recovery around
    * decoders (`outlet/flow/decoder.go:60-71`).
    */
  def decode(payload: Array[Byte], sourceAddr: Array[Byte], tsReceived: Long,
      options: DecodeOptions, state0: TemplateState): Result =
    try decodeUnsafe(payload, sourceAddr, tsReceived, options, state0)
    catch {
      case _: ArrayIndexOutOfBoundsException | _: IndexOutOfBoundsException |
           _: NegativeArraySizeException =>
        Result(state0, Nil, Some("malformed datagram"), false)
    }

  private def decodeUnsafe(payload: Array[Byte], sourceAddr: Array[Byte],
      tsReceived: Long, options: DecodeOptions, state0: TemplateState): Result = {
    if (payload.length < 2) return Result(state0, Nil, Some("payload too small"), false)
    val version = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
    val out = ArrayBuffer.empty[DecodedFlow]
    val bf = new FlowBuilder(out += _)
    var ts = tsReceived
    var sysUptime = 0L
    val drops = new DropCounter

    def finalizeRecord(): Unit = {
      if (bf.timeReceived == 0) bf.timeReceived = ts
      bf.exporterAddress = sourceAddr
      bf.finalizeRecord()
    }

    version match {
      case 5 =>
        if (options.decap != PacketParse.DecapNone)
          return Result(state0, Nil, None, false, 1L) // non-encapsulated packet
        val w = new Wire(payload, 2, payload.length)
        if (!w.hasBytes(22)) return Result(state0, Nil, Some("NetFlow v5 decoding error"), false)
        val count = w.u16()
        val hdrUptime = w.u32(); val unixSecs = w.u32()
        w.skip(4) // unixNsecs
        w.skip(4) // flowSequence
        w.skip(2) // engineType + engineId
        val samplingInterval = w.u16()
        if (options.timestampSource != DecodeOptions.TsInput) {
          ts = unixSecs; sysUptime = hdrUptime
        }
        var i = 0
        while (i < count && w.hasBytes(48)) {
          decodeV5Record(w, samplingInterval, ts, sysUptime, options, bf)
          finalizeRecord()
          i += 1
        }
        Result(state0, out.toSeq, None, false)

      case 9 | 10 =>
        val w = new Wire(payload, 2, payload.length)
        var obsDomainId = 0L
        if (version == 9) {
          if (!w.hasBytes(18)) return Result(state0, Nil, Some("short v9 header"), false)
          w.skip(2) // count
          sysUptime = w.u32()
          val unixSecs = w.u32()
          w.skip(4) // sequence
          obsDomainId = w.u32()
          if (options.timestampSource != DecodeOptions.TsInput) ts = unixSecs
        } else {
          if (!w.hasBytes(14)) return Result(state0, Nil, Some("short IPFIX header"), false)
          w.skip(2) // length
          val exportTime = w.u32()
          w.skip(4) // sequence
          obsDomainId = w.u32()
          if (options.timestampSource == DecodeOptions.TsNetflowPacket) ts = exportTime
        }
        var state = state0
        var missing = false
        // one sequential pass: templates registered as encountered apply to
        // later sets in the same datagram (goflow2 semantics); option-data
        // sampling rates likewise land before subsequent data records
        while (w.hasBytes(4)) {
          val setId = w.u16()
          val setLen = w.u16()
          if (setLen < 4 || setLen - 4 > w.remaining) {
            return Result(state, Nil, Some("truncated flowset"), false)
          }
          val body = w.slice(setLen - 4)
          if ((version == 9 && setId == 0) || (version == 10 && setId == 2)) {
            state = parseTemplateSet(version, obsDomainId, body, state)
          } else if ((version == 9 && setId == 1) || (version == 10 && setId == 3)) {
            state = parseOptionsTemplateSet(version, obsDomainId, body, state)
          } else if (setId >= 256) {
            state.template(version, obsDomainId, setId) match {
              case None =>
                missing = true
                state = state.withDrop()
              case Some(entry) =>
                val records = parseDataRecords(entry, body)
                if (entry.kind == "options_template") {
                  records.foreach { rec =>
                    state = applySamplingOptions(version, obsDomainId, entry, rec, state)
                  }
                } else {
                  records.foreach { rec =>
                    decodeRecord(version, obsDomainId, state, rec, ts, sysUptime,
                      options, bf, finalizeRecord _, drops)
                  }
                }
            }
          }
        }
        // reference root.go:141-147: ErrorTemplateNotFound aborts the WHOLE
        // datagram — even flows whose templates were known decode to
        // nothing ("template not received yet", never an error). Template
        // and sampling-option sets seen in the same datagram are kept, so
        // the exporter's retransmission decodes in full.
        if (missing) Result(state, Nil, None, true, drops.nonEncap)
        else Result(state, out.toSeq, None, false, drops.nonEncap)

      case _ =>
        Result(state0, Nil, Some(s"unknown NetFlow version $version"), false)
    }
  }

  /** NetFlow v5 fixed 48-byte record (`decode.go:38-68`). */
  private def decodeV5Record(w: Wire, samplingInterval: Int, ts: Long,
      sysUptime: Long, options: DecodeOptions, bf: FlowBuilder): Unit = {
    val srcAddr = w.u32(); val dstAddr = w.u32(); val nextHop = w.u32()
    val input = w.u16(); val output = w.u16()
    val dPkts = w.u32(); val dOctets = w.u32()
    val first = w.u32(); w.skip(4) // last
    val srcPort = w.u16(); val dstPort = w.u16()
    w.skip(1) // pad
    val tcpFlags = w.u8(); val proto = w.u8(); val tos = w.u8()
    val srcAS = w.u16(); val dstAS = w.u16()
    val srcMask = w.u8(); val dstMask = w.u8()
    w.skip(2) // pad

    // raw 16-bit field including the sampling-mode top bits, exactly as
    // the reference consumes it (decode.go:40 uses the wire value as-is)
    bf.samplingRate = samplingInterval.toLong
    bf.inIf = input; bf.outIf = output
    bf.srcAddr = Addr.fromUint32(srcAddr)
    bf.dstAddr = Addr.fromUint32(dstAddr)
    bf.nextHop = Addr.fromUint32(nextHop)
    bf.srcNetMask = srcMask; bf.dstNetMask = dstMask
    bf.srcAS = srcAS; bf.dstAS = dstAS
    bf.appendUint(Col.Bytes, dOctets)
    bf.appendUint(Col.Packets, dPkts)
    bf.appendUint(Col.EType, PacketParse.ETypeIPv4)
    bf.appendUint(Col.Proto, proto)
    bf.appendUint(Col.SrcPort, srcPort)
    bf.appendUint(Col.DstPort, dstPort)
    bf.appendUint(Col.IPTos, tos)
    bf.appendUint(Col.TCPFlags, tcpFlags)
    // reference-faithful raw arithmetic (decode.go:61): uptime and First
    // are milliseconds mixed into epoch seconds — the reference's own
    // golden tests pin these exact values (root_test.go:651-652)
    if (options.timestampSource == DecodeOptions.TsNetflowFirstSwitched)
      bf.timeReceived = ts - sysUptime + first
    if (bf.samplingRate == 0) bf.samplingRate = 1
  }

  /** Template flowset: repeated (templateId, fieldCount, field specs);
    * IPFIX field specs may carry an enterprise number (RFC 7011 §3.2).
    */
  private def parseTemplateSet(version: Int, obsDomainId: Long, w: Wire,
      state0: TemplateState): TemplateState = {
    var state = state0
    var done = false
    while (!done && w.hasBytes(4)) {
      val tid = w.u16()
      val fc = w.u16()
      if (tid == 0 || fc == 0) done = true
      else {
        val fields = ArrayBuffer.empty[TemplateField]
        var i = 0
        while (i < fc && w.hasBytes(4)) {
          var ftype = w.u16()
          val flen = w.u16()
          var pen = 0L
          if (version == 10 && (ftype & 0x8000) != 0 && w.hasBytes(4)) {
            pen = w.u32()
            ftype &= 0x7fff
          }
          fields += TemplateField(ftype, flen, pen)
          i += 1
        }
        if (fields.length == fc)
          state = state.withTemplate(version, obsDomainId, tid,
            TemplateEntry("template", 0, fields.toSeq))
        else done = true
      }
    }
    state
  }

  /** Options-template flowset. v9 carries scope/option lengths in bytes
    * (RFC 3954 §6.1); IPFIX carries field counts (RFC 7011 §3.4.2).
    */
  private def parseOptionsTemplateSet(version: Int, obsDomainId: Long, w: Wire,
      state0: TemplateState): TemplateState = {
    var state = state0
    var done = false
    while (!done && w.hasBytes(6)) {
      val tid = w.u16()
      if (tid == 0) done = true
      else if (version == 9) {
        val scopeLen = w.u16(); val optionLen = w.u16()
        val scopeCount = scopeLen / 4
        val optionCount = optionLen / 4
        val fields = ArrayBuffer.empty[TemplateField]
        var i = 0
        while (i < scopeCount + optionCount && w.hasBytes(4)) {
          fields += TemplateField(w.u16(), w.u16(), 0L)
          i += 1
        }
        if (fields.length == scopeCount + optionCount)
          state = state.withTemplate(version, obsDomainId, tid,
            TemplateEntry("options_template", scopeCount, fields.toSeq))
        else done = true
      } else {
        val fc = w.u16(); val scopeCount = w.u16()
        val fields = ArrayBuffer.empty[TemplateField]
        var i = 0
        while (i < fc && w.hasBytes(4)) {
          var ftype = w.u16()
          val flen = w.u16()
          var pen = 0L
          if ((ftype & 0x8000) != 0 && w.hasBytes(4)) {
            pen = w.u32()
            ftype &= 0x7fff
          }
          fields += TemplateField(ftype, flen, pen)
          i += 1
        }
        if (fields.length == fc)
          state = state.withTemplate(version, obsDomainId, tid,
            TemplateEntry("options_template", scopeCount, fields.toSeq))
        else done = true
      }
    }
    state
  }

  /** Slice a data flowset into records by its template; 0xffff lengths are
    * variable (1- or 3-byte prefix, RFC 7011 §7).
    */
  private def parseDataRecords(entry: TemplateEntry, w: Wire): Seq[Seq[DataField]] = {
    val minLen = entry.fields.iterator.map(f => if (f.flen == 0xffff) 1 else f.flen).sum
    val out = ArrayBuffer.empty[Seq[DataField]]
    if (minLen == 0) return out.toSeq
    var ok = true
    while (ok && w.remaining >= minLen) {
      val rec = ArrayBuffer.empty[DataField]
      entry.fields.foreach { f =>
        if (ok) {
          val len =
            if (f.flen != 0xffff) f.flen
            else if (!w.hasBytes(1)) { ok = false; 0 }
            else {
              val l1 = w.u8()
              if (l1 < 255) l1
              else if (w.hasBytes(2)) w.u16()
              else { ok = false; 0 }
            }
          if (ok && w.hasBytes(len)) rec += DataField(f.ftype, f.pen, w.take(len))
          else ok = false
        }
      }
      if (ok && rec.length == entry.fields.length) out += rec.toSeq
    }
    out.toSeq
  }

  /** Option-data record → sampling rates (`decode.go:71-103`): rate from
    * samplingInterval/samplerRandomInterval or packet interval/space pair,
    * keyed by samplerId/selectorId (0 when absent).
    */
  private def applySamplingOptions(version: Int, obsDomainId: Long,
      entry: TemplateEntry, rec: Seq[DataField], state0: TemplateState): TemplateState = {
    var samplingRate = 0L
    var samplerId = 0L
    var packetInterval = 0L
    var packetSpace = 0L
    // reference iterates the option (non-scope) values only
    rec.drop(entry.scopeCount).foreach { f =>
      if (f.pen == 0) {
        val v = Wire.uNumber(f.value)
        f.ftype match {
          case F.SamplingInterval | F.SamplerRandomInterval => samplingRate = v
          case F.SamplerId | F.SelectorId => samplerId = v
          case F.SamplingPacketInterval => packetInterval = v
          case F.SamplingPacketSpace => packetSpace = v
          case _ => ()
        }
      }
    }
    if (packetInterval > 0)
      samplingRate = (packetInterval + packetSpace) / packetInterval
    if (samplingRate > 0)
      state0.withSamplingRate(version, obsDomainId, samplerId, samplingRate)
    else state0
  }

  /** IPFIX information element ids used by the mapper (IANA registry; the
    * sub-range 1-127 is shared with NetFlow v9 per RFC 5102).
    */
  private object F {
    val OctetDeltaCount = 1
    val PacketDeltaCount = 2
    val ProtocolIdentifier = 4
    val IpClassOfService = 5
    val TcpControlBits = 6
    val SourceTransportPort = 7
    val SourceIPv4Address = 8
    val SourceIPv4PrefixLength = 9
    val IngressInterface = 10
    val DestinationTransportPort = 11
    val DestinationIPv4Address = 12
    val DestinationIPv4PrefixLength = 13
    val EgressInterface = 14
    val IpNextHopIPv4Address = 15
    val BgpSourceAsNumber = 16
    val BgpDestinationAsNumber = 17
    val BgpNextHopIPv4Address = 18
    val FirstSwitched = 22 // NFv9 FIRST_SWITCHED
    val PostOctetDeltaCount = 23
    val PostPacketDeltaCount = 24
    val SourceIPv6Address = 27
    val DestinationIPv6Address = 28
    val SourceIPv6PrefixLength = 29
    val DestinationIPv6PrefixLength = 30
    val FlowLabelIPv6 = 31
    val IcmpTypeCodeIPv4 = 32
    val SamplingInterval = 34
    val SamplerId = 48
    val SamplerRandomInterval = 50
    val MinimumTTL = 52
    val FragmentIdentification = 54
    val SourceMacAddress = 56
    val PostDestinationMacAddress = 57
    val VlanId = 58
    val PostVlanId = 59
    val FlowDirection = 61
    val IpNextHopIPv6Address = 62
    val BgpNextHopIPv6Address = 63
    val MplsLabelStackSection = 70 // ..79 for sections 2-10
    val MplsLabelStackSection10 = 79
    val DestinationMacAddress = 80
    val PostSourceMacAddress = 81
    val FragmentOffset = 88
    val ForwardingStatus = 89
    val CommonPropertiesId = 137 // Juniper PEN usage
    val IcmpTypeCodeIPv6 = 139
    val FlowStartSeconds = 150
    val FlowStartMilliseconds = 152
    val FlowStartMicroseconds = 154
    val FlowStartNanoseconds = 156
    val IcmpTypeIPv4 = 176
    val IcmpCodeIPv4 = 177
    val IcmpTypeIPv6 = 178
    val IcmpCodeIPv6 = 179
    val IpTTL = 192
    val PostNATSourceIPv4Address = 225
    val PostNATDestinationIPv4Address = 226
    val PostNAPTSourceTransportPort = 227
    val PostNAPTDestinationTransportPort = 228
    val InitiatorOctets = 231
    val ResponderOctets = 232
    val IngressVRFID = 234
    val EgressVRFID = 235
    val IngressPhysicalInterface = 252
    val EgressPhysicalInterface = 253
    val Dot1qVlanId = 243
    val PostDot1qVlanId = 254
    val SelectorId = 302
    val SamplingPacketInterval = 305
    val SamplingPacketSpace = 306
    val DataLinkFrameSection = 315
  }

  private val DirectionIngress = 1
  private val DirectionEgress = 2

  /** Map one data record to flow messages (`decode.go:112-408`): a forward
    * pass, then — when RFC 5103 reverse-PEN fields are present — a reverse
    * pass whose appends land on each column's direction twin.
    */
  /** "non-encapsulated packet" drop counter (reference `metrics.errors`,
    * `decode.go:390-392`).
    */
  final class DropCounter { var nonEncap: Long = 0L }

  private def decodeRecord(version: Int, obsDomainId: Long, state: TemplateState,
      fields: Seq[DataField], ts: Long, sysUptime: Long, options: DecodeOptions,
      bf: FlowBuilder, finalizeRecord: () => Unit, drops: DropCounter): Unit = {
    var reversePresent: java.util.BitSet = null
    val needDecap = options.decap != PacketParse.DecapNone

    var dir = 0 // 0 = forward, 1 = reverse
    var done = false
    while (dir <= 1 && !done) {
      var etype = 0L
      var dstPort = 0; var srcPort = 0
      var proto = 0; var icmpType = 0; var icmpCode = 0
      var foundIcmpTypeCode = false
      var decapOK = false
      var undone = false
      val mplsLabels = ArrayBuffer.empty[Long]

      val it = fields.iterator
      while (it.hasNext && !undone) {
        val field = it.next()
        val v = field.value
        var skip = false
        if (field.pen != 0L) {
          if (field.pen == ReversePen) {
            if (dir == 0) {
              if (reversePresent == null) reversePresent = new java.util.BitSet()
              reversePresent.set(field.ftype)
              skip = true
            }
          } else if (field.pen == JuniperPen) {
            // Go precedence: v[0]&0xfc>>2 is (v[0] & 0xfc) >> 2 — the top
            // six bits select the 0x02 "forwarding exception" class
            if (field.ftype == F.CommonPropertiesId && v.length == 2 &&
              ((v(0) & 0xfc) >> 2) == 0x02) {
              // forwardingExceptionCode != 0 means the packet was dropped
              if ((Wire.uNumber(v) & 0x03ff) == 0)
                bf.appendUint(Col.ForwardingStatus, 64)
              else bf.appendUint(Col.ForwardingStatus, 128)
            }
            skip = true
          } else skip = true // other PENs unhandled
        } else if (dir == 1 && reversePresent != null && reversePresent.get(field.ftype)) {
          skip = true // the reverse twin supplies this one
        }

        if (!skip) field.ftype match {
          // statistics — initiator/responderOctets (RFC 5103 biflow octet
          // counters, common on firewalls) count as Bytes exactly like the
          // delta counters (ref outlet/flow/decoder/netflow/decode.go:174)
          case F.OctetDeltaCount | F.PostOctetDeltaCount |
               F.InitiatorOctets | F.ResponderOctets =>
            bf.appendUint(Col.Bytes, Wire.uNumber(v))
          case F.PacketDeltaCount | F.PostPacketDeltaCount =>
            val n = Wire.uNumber(v)
            if (dir == 1 && n == 0) {
              // reverse direction of an empty biflow half: drop the record
              bf.undo()
              undone = true; done = true
            } else bf.appendUint(Col.Packets, n)
          case F.SamplingInterval | F.SamplerRandomInterval =>
            bf.samplingRate = Wire.uNumber(v)
          case F.SamplerId | F.SelectorId =>
            bf.samplingRate = state.samplingRate(version, obsDomainId, Wire.uNumber(v))

          // L3
          case F.SourceIPv4Address =>
            if (!Wire.isAllZero(v)) { etype = PacketParse.ETypeIPv4; bf.srcAddr = Addr.to16(v) }
          case F.DestinationIPv4Address =>
            if (!Wire.isAllZero(v)) { etype = PacketParse.ETypeIPv4; bf.dstAddr = Addr.to16(v) }
          case F.SourceIPv6Address =>
            if (!Wire.isAllZero(v)) { etype = PacketParse.ETypeIPv6; bf.srcAddr = Addr.to16(v) }
          case F.DestinationIPv6Address =>
            if (!Wire.isAllZero(v)) { etype = PacketParse.ETypeIPv6; bf.dstAddr = Addr.to16(v) }
          case F.SourceIPv4PrefixLength | F.SourceIPv6PrefixLength =>
            bf.srcNetMask = Wire.uNumber(v).toInt
          case F.DestinationIPv4PrefixLength | F.DestinationIPv6PrefixLength =>
            bf.dstNetMask = Wire.uNumber(v).toInt
          case F.IpNextHopIPv4Address | F.BgpNextHopIPv4Address |
               F.IpNextHopIPv6Address | F.BgpNextHopIPv6Address =>
            bf.nextHop = Addr.to16(v)

          // L4
          case F.SourceTransportPort =>
            srcPort = Wire.uNumber(v).toInt
            bf.appendUint(Col.SrcPort, srcPort)
          case F.DestinationTransportPort =>
            dstPort = Wire.uNumber(v).toInt
            bf.appendUint(Col.DstPort, dstPort)
          case F.ProtocolIdentifier =>
            proto = Wire.uNumber(v).toInt
            bf.appendUint(Col.Proto, proto)

          // network
          case F.BgpSourceAsNumber => bf.srcAS = Wire.uNumber(v)
          case F.BgpDestinationAsNumber => bf.dstAS = Wire.uNumber(v)

          // interfaces
          case F.IngressInterface => bf.inIf = Wire.uNumber(v)
          case F.EgressInterface => bf.outIf = Wire.uNumber(v)
          case F.IngressPhysicalInterface => if (bf.inIf == 0) bf.inIf = Wire.uNumber(v)
          case F.EgressPhysicalInterface => if (bf.outIf == 0) bf.outIf = Wire.uNumber(v)

          // RFC 7133 data link frame section
          case F.DataLinkFrameSection =>
            val l3Length = PacketParse.parseEthernet(bf, options.decap, v, 0)
            if (l3Length > 0) {
              bf.appendUint(Col.Bytes, l3Length)
              bf.appendUint(Col.Packets, 1)
              decapOK = true
            }

          // MPLS stack sections
          case t if t >= F.MplsLabelStackSection && t <= F.MplsLabelStackSection10 =>
            val uv = Wire.uNumber(v) >> 4
            if (uv > 0) mplsLabels += uv

          // VRF
          case F.IngressVRFID => bf.appendUint(Col.IngressVRFID, Wire.uNumber(v))
          case F.EgressVRFID => bf.appendUint(Col.EgressVRFID, Wire.uNumber(v))

          // remaining
          case F.ForwardingStatus => bf.appendUint(Col.ForwardingStatus, Wire.uNumber(v))
          case F.FlowDirection =>
            Wire.uNumber(v) match {
              case 0 => bf.appendUint(Col.FlowDirection, DirectionIngress)
              case 1 => bf.appendUint(Col.FlowDirection, DirectionEgress)
              case _ => ()
            }

          case _ =>
            if (options.timestampSource == DecodeOptions.TsNetflowFirstSwitched)
              field.ftype match {
                case F.FirstSwitched => bf.timeReceived = ts - sysUptime + Wire.uNumber(v)
                case F.FlowStartSeconds => bf.timeReceived = Wire.uNumber(v)
                case F.FlowStartMilliseconds => bf.timeReceived = Wire.uNumber(v) / 1000L
                case F.FlowStartMicroseconds => bf.timeReceived = Wire.uNumber(v) / 1000000L
                case F.FlowStartNanoseconds => bf.timeReceived = ts + Wire.uNumber(v) / 1000000000L
                case _ => ()
              }
            field.ftype match {
              // NAT
              case F.PostNATSourceIPv4Address => bf.appendIp(Col.SrcAddrNAT, Addr.to16(v))
              case F.PostNATDestinationIPv4Address => bf.appendIp(Col.DstAddrNAT, Addr.to16(v))
              case F.PostNAPTSourceTransportPort => bf.appendUint(Col.SrcPortNAT, Wire.uNumber(v))
              case F.PostNAPTDestinationTransportPort => bf.appendUint(Col.DstPortNAT, Wire.uNumber(v))
              // L2
              case F.VlanId | F.Dot1qVlanId =>
                if (bf.srcVlan == 0) bf.srcVlan = Wire.uNumber(v).toInt
              case F.PostVlanId | F.PostDot1qVlanId =>
                if (bf.dstVlan == 0) bf.dstVlan = Wire.uNumber(v).toInt
              case F.SourceMacAddress | F.PostSourceMacAddress =>
                bf.appendUint(Col.SrcMAC, Wire.uNumber(v))
              case F.DestinationMacAddress | F.PostDestinationMacAddress =>
                bf.appendUint(Col.DstMAC, Wire.uNumber(v))
              // misc L3/L4
              case F.IpTTL | F.MinimumTTL => bf.appendUint(Col.IPTTL, Wire.uNumber(v))
              case F.IpClassOfService => bf.appendUint(Col.IPTos, Wire.uNumber(v))
              case F.FlowLabelIPv6 => bf.appendUint(Col.IPv6FlowLabel, Wire.uNumber(v))
              case F.TcpControlBits => bf.appendUint(Col.TCPFlags, Wire.uNumber(v))
              case F.FragmentIdentification => bf.appendUint(Col.IPFragmentID, Wire.uNumber(v))
              case F.FragmentOffset => bf.appendUint(Col.IPFragmentOffset, Wire.uNumber(v))
              // ICMP
              case F.IcmpTypeCodeIPv4 | F.IcmpTypeCodeIPv6 =>
                val tc = Wire.uNumber(v)
                icmpType = ((tc >> 8) & 0xff).toInt
                icmpCode = (tc & 0xff).toInt
                foundIcmpTypeCode = true
              case F.IcmpTypeIPv4 | F.IcmpTypeIPv6 =>
                icmpType = Wire.uNumber(v).toInt
                foundIcmpTypeCode = true
              case F.IcmpCodeIPv4 | F.IcmpCodeIPv6 =>
                icmpCode = Wire.uNumber(v).toInt
                foundIcmpTypeCode = true
              case _ => ()
            }
        }
      }

      if (!undone) {
        if (proto == PacketParse.ProtoICMPv4 || proto == PacketParse.ProtoICMPv6) {
          if (!foundIcmpTypeCode && srcPort == 0) {
            // Cisco-style dst-port encoding of ICMP type/code
            icmpType = (dstPort >> 8) & 0xff
            icmpCode = dstPort & 0xff
          }
          if (proto == PacketParse.ProtoICMPv4) {
            bf.appendUint(Col.ICMPv4Type, icmpType)
            bf.appendUint(Col.ICMPv4Code, icmpCode)
          } else {
            bf.appendUint(Col.ICMPv6Type, icmpType)
            bf.appendUint(Col.ICMPv6Code, icmpCode)
          }
        }
        bf.appendUint(Col.EType, etype)
        if (mplsLabels.nonEmpty) bf.appendArray(Col.MPLSLabels, mplsLabels.toSeq)
        if (bf.samplingRate == 0)
          bf.samplingRate = state.samplingRate(version, obsDomainId, 0L)

        def localFinalize(): Unit =
          if (needDecap && !decapOK) { // non-encapsulated packet
            drops.nonEncap += 1
            bf.undo()
          } else finalizeRecord()

        if (dir == 0 && reversePresent == null) {
          localFinalize()
          done = true
        } else if (dir == 0) {
          localFinalize()
          bf.reverse()
        } else {
          bf.reverse()
          localFinalize()
        }
      }
      dir += 1
    }
  }
}
