package graft.decode

/** Raw packet-header dissection used by the sFlow sampled-header record and
  * the IPFIX dataLinkFrameSection (RFC 7133): Ethernet → VLAN/MPLS → IPv4/
  * IPv6 → TCP/UDP/ICMP, with optional decapsulation (IPIP/GRE/VXLAN/SRv6).
  * Semantics follow reference `outlet/flow/decoder/helpers.go:18-303`; the
  * implementation is index arithmetic over the frame bytes.
  */
object PacketParse {

  val ETypeIPv4 = 0x0800
  val ETypeIPv6 = 0x86dd
  val ETypeVLAN = 0x8100
  val ETypeMPLS = 0x8847

  val ProtoICMPv4 = 1
  val ProtoIPv4 = 4
  val ProtoTCP = 6
  val ProtoUDP = 17
  val ProtoIPv6 = 41
  val ProtoSRH = 43
  val ProtoGRE = 47
  val ProtoICMPv6 = 58
  val PortVXLAN = 4789

  sealed trait Decap
  case object DecapNone extends Decap
  case object DecapIpip extends Decap
  case object DecapGre extends Decap
  case object DecapVxlan extends Decap
  case object DecapSrv6 extends Decap

  private def u16(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)
  private def u32(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
      ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)

  /** Parse an IPv4 header at `data[off..]`; returns the L3 length
    * (`helpers.go:18-58`). Populates `bf` only when not decapsulating.
    */
  def parseIPv4(bf: FlowBuilder, decap: Decap, data: Array[Byte], off: Int): Long = {
    if (data.length - off < 20) return 0L
    val l3Length = u16(data, off + 2).toLong
    val fragOffset = u16(data, off + 6) & 0x1fff
    val proto = data(off + 9) & 0xff
    if (decap == DecapNone) {
      bf.appendUint(Col.EType, ETypeIPv4)
      bf.srcAddr = Addr.to16(java.util.Arrays.copyOfRange(data, off + 12, off + 16))
      bf.dstAddr = Addr.to16(java.util.Arrays.copyOfRange(data, off + 16, off + 20))
      bf.appendUint(Col.IPTos, data(off + 1) & 0xff)
      bf.appendUint(Col.IPTTL, data(off + 8) & 0xff)
      bf.appendUint(Col.IPFragmentID, u16(data, off + 4))
      bf.appendUint(Col.IPFragmentOffset, fragOffset)
      bf.appendUint(Col.Proto, proto)
    }
    val ihl = (data(off) & 0xf) * 4
    val next = if (data.length - off >= ihl) off + ihl else data.length
    if (fragOffset == 0) {
      val inner = parseL4(bf, decap, data, next, proto)
      if (decap != DecapNone) inner else l3Length
    } else if (decap != DecapNone) 0L
    else l3Length
  }

  /** Parse an IPv6 header (`helpers.go:61-90`). */
  def parseIPv6(bf: FlowBuilder, decap: Decap, data: Array[Byte], off: Int): Long = {
    if (data.length - off < 40) return 0L
    val l3Length = u16(data, off + 4).toLong + 40
    val proto = data(off + 6) & 0xff
    if (decap == DecapNone) {
      bf.appendUint(Col.EType, ETypeIPv6)
      bf.srcAddr = java.util.Arrays.copyOfRange(data, off + 8, off + 24)
      bf.dstAddr = java.util.Arrays.copyOfRange(data, off + 24, off + 40)
      bf.appendUint(Col.Proto, proto)
      bf.appendUint(Col.IPTos, (u16(data, off) & 0xff0) >> 4)
      bf.appendUint(Col.IPTTL, data(off + 7) & 0xff)
      bf.appendUint(Col.IPv6FlowLabel, u32(data, off) & 0xfffff)
    }
    val inner = parseL4(bf, decap, data, off + 40, proto)
    if (decap != DecapNone) inner else l3Length
  }

  /** Parse the L4 layer; returns inner L3 length when decapsulating
    * (`helpers.go:93-191`).
    */
  def parseL4(bf: FlowBuilder, decap: Decap, data: Array[Byte], off0: Int,
      proto0: Int): Long = {
    var off = off0
    var proto = proto0
    decap match {
      case DecapNone => ()
      case DecapVxlan =>
        if (proto == ProtoUDP && data.length - off > 16 && u16(data, off + 2) == PortVXLAN)
          return parseEthernet(bf, DecapNone, data, off + 16)
        return 0L
      case DecapGre =>
        if (proto == ProtoGRE && data.length - off > 4) {
          val flagAndVersion = u16(data, off)
          val greProtocol = u16(data, off + 2)
          if ((flagAndVersion & 0x4fff) != 0) return 0L // only RFC 2890
          val skip = 4 + java.lang.Integer.bitCount(flagAndVersion) * 4
          if (data.length - off >= skip) {
            greProtocol match {
              case ETypeIPv4 => return parseIPv4(bf, DecapNone, data, off + skip)
              case ETypeIPv6 => return parseIPv6(bf, DecapNone, data, off + skip)
              case _ => return 0L
            }
          }
        }
        return 0L
      case DecapIpip =>
        proto match {
          case ProtoIPv4 => return parseIPv4(bf, DecapNone, data, off)
          case ProtoIPv6 => return parseIPv6(bf, DecapNone, data, off)
          case _ => return 0L
        }
      case DecapSrv6 =>
        // IP-in-IPv6 with zero or more SRH headers (helpers.go:133-157)
        while (true) {
          proto match {
            case ProtoIPv4 => return parseIPv4(bf, DecapNone, data, off)
            case ProtoIPv6 => return parseIPv6(bf, DecapNone, data, off)
            case ProtoSRH =>
              if (data.length - off < 8 || data(off + 2) != 4) return 0L
              val skip = 8 + (data(off + 1) & 0xff) * 8
              if (data.length - off < skip) return 0L
              proto = data(off) & 0xff
              off += skip
            case _ => return 0L
          }
        }
        return 0L
    }
    if (proto == ProtoTCP || proto == ProtoUDP) {
      if (data.length - off > 4) {
        bf.appendUint(Col.SrcPort, u16(data, off))
        bf.appendUint(Col.DstPort, u16(data, off + 2))
      }
    }
    proto match {
      case ProtoTCP if data.length - off > 13 =>
        bf.appendUint(Col.TCPFlags, data(off + 13) & 0xff)
      case ProtoICMPv4 if data.length - off > 2 =>
        bf.appendUint(Col.ICMPv4Type, data(off) & 0xff)
        bf.appendUint(Col.ICMPv4Code, data(off + 1) & 0xff)
      case ProtoICMPv6 if data.length - off > 2 =>
        bf.appendUint(Col.ICMPv6Type, data(off) & 0xff)
        bf.appendUint(Col.ICMPv6Code, data(off + 1) & 0xff)
      case _ => ()
    }
    0L
  }

  /** Parse an Ethernet frame; returns the L3 length (`helpers.go:194-303`):
    * MACs, VLAN tag chain, the MPLS stack with the RFC 9790 payload
    * heuristic, then the IP payload.
    */
  def parseEthernet(bf: FlowBuilder, decap: Decap, data: Array[Byte], off0: Int): Long = {
    var off = off0
    if (data.length - off < 14) return 0L
    if (decap == DecapNone) {
      var dst = 0L; var src = 0L
      var i = 0
      while (i < 6) {
        dst = (dst << 8) | (data(off + i) & 0xffL)
        src = (src << 8) | (data(off + 6 + i) & 0xffL)
        i += 1
      }
      bf.appendUint(Col.DstMAC, dst)
      bf.appendUint(Col.SrcMAC, src)
    }
    var etherType = u16(data, off + 12)
    off += 14
    var vlan = 0
    while (etherType == ETypeVLAN) {
      if (data.length - off < 4) return 0L
      if (decap == DecapNone) vlan = ((data(off) & 0xf) << 8) | (data(off + 1) & 0xff)
      etherType = u16(data, off + 2)
      off += 4
    }
    if (vlan != 0) {
      if (bf.srcVlan == 0) bf.srcVlan = vlan
      if (bf.dstVlan == 0) bf.dstVlan = vlan
    }
    if (etherType == ETypeMPLS) {
      val mplsLabels = scala.collection.mutable.ArrayBuffer.empty[Long]
      var bottom = false
      while (!bottom) {
        if (data.length - off < 5) return 0L
        val label = (((data(off) & 0xffL) << 16) | ((data(off + 1) & 0xffL) << 8) |
          (data(off + 2) & 0xffL)) >> 4
        bottom = (data(off + 2) & 1) == 1
        off += 4
        mplsLabels += label
        if (bottom) {
          // payload heuristic: explicit-null labels, else first nibble,
          // else an all-zero control word hides an Ethernet payload
          label match {
            case 0 => etherType = ETypeIPv4
            case 2 => etherType = ETypeIPv6
            case _ =>
              if (data.length - off < 1) return 0L
              (data(off) & 0xff) >> 4 match {
                case 0x4 => etherType = ETypeIPv4
                case 0x6 => etherType = ETypeIPv6
                case 0x0 =>
                  if (data.length - off < 4) return 0L
                  if (u32(data, off) == 0L) {
                    if (mplsLabels.nonEmpty && decap == DecapNone)
                      bf.appendArray(Col.MPLSLabels, mplsLabels.toSeq)
                    return parseEthernet(bf, decap, data, off + 4)
                  }
                  return 0L
                case _ => return 0L
              }
          }
        }
      }
      if (mplsLabels.nonEmpty && decap == DecapNone)
        bf.appendArray(Col.MPLSLabels, mplsLabels.toSeq)
    }
    etherType match {
      case ETypeIPv4 => parseIPv4(bf, decap, data, off)
      case ETypeIPv6 => parseIPv6(bf, decap, data, off)
      case _ => 0L
    }
  }
}
