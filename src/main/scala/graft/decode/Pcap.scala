package graft.decode

import scala.collection.mutable.ArrayBuffer

/** Minimal classic-pcap reader for the file-replay source (S2) and the
  * decoder golden fixtures: Ethernet (+VLAN) → IPv4/IPv6 → UDP, returning
  * each datagram's payload. Equivalent of the reference test helper
  * `common/helpers/tests_pcap.go:38-47` (which concatenates every UDP
  * payload in the capture).
  */
object Pcap {

  final case class Datagram(tsSec: Long, payload: Array[Byte])

  /** Parse a classic pcap byte image (both endiannesses, any snaplen). */
  def datagrams(data: Array[Byte]): Seq[Datagram] = {
    require(data.length >= 24, "not a pcap file")
    val little = (data(0) & 0xff) == 0xd4
    def u32(i: Int): Long =
      if (little)
        (data(i) & 0xffL) | ((data(i + 1) & 0xffL) << 8) |
          ((data(i + 2) & 0xffL) << 16) | ((data(i + 3) & 0xffL) << 24)
      else
        ((data(i) & 0xffL) << 24) | ((data(i + 1) & 0xffL) << 16) |
          ((data(i + 2) & 0xffL) << 8) | (data(i + 3) & 0xffL)
    val magicOk = (data(0) & 0xff, data(1) & 0xff) match {
      case (0xd4, 0xc3) | (0xa1, 0xb2) => true
      case _ => false
    }
    require(magicOk, "bad pcap magic")

    val out = ArrayBuffer.empty[Datagram]
    var off = 24
    while (off + 16 <= data.length) {
      val tsSec = u32(off)
      // keep the length as Long: a corrupted record narrowed to Int could
      // go negative, walk the cursor backward and index out of bounds
      val inclLen = u32(off + 8)
      off += 16
      if (inclLen < 0 || off + inclLen > data.length) return out.toSeq
      udpPayload(data, off, inclLen.toInt).foreach(p => out += Datagram(tsSec, p))
      off += inclLen.toInt
    }
    out.toSeq
  }

  /** UDP payload of one Ethernet frame, None for non-UDP packets. */
  private def udpPayload(data: Array[Byte], off0: Int, len: Int): Option[Array[Byte]] = {
    def u16(i: Int): Int = ((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)
    val end = off0 + len
    if (len < 14) return None
    var etherType = u16(off0 + 12)
    var off = off0 + 14
    while (etherType == PacketParse.ETypeVLAN && off + 4 <= end) {
      etherType = u16(off + 2)
      off += 4
    }
    var proto = -1
    if (etherType == PacketParse.ETypeIPv4 && off + 20 <= end) {
      proto = data(off + 9) & 0xff
      off += (data(off) & 0xf) * 4
    } else if (etherType == PacketParse.ETypeIPv6 && off + 40 <= end) {
      proto = data(off + 6) & 0xff
      off += 40
    } else return None
    if (proto != PacketParse.ProtoUDP || off + 8 > end) return None
    // honor the UDP length field: frames shorter than the 60-byte
    // Ethernet minimum carry trailer padding the capture includes, which
    // would otherwise parse as a bogus trailing flowset
    val udpLen = u16(off + 4)
    val payloadEnd =
      if (udpLen >= 8) math.min(end, off + udpLen) else end
    Some(java.util.Arrays.copyOfRange(data, off + 8, payloadEnd))
  }

  def readFile(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  def readResource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** All UDP payloads of a capture concatenated — the shape the reference's
    * golden decoder tests feed to `Decode` (`tests_pcap.go:38-47`).
    */
  def l4(data: Array[Byte]): Array[Byte] =
    datagrams(data).map(_.payload).foldLeft(Array.emptyByteArray)(_ ++ _)
}
