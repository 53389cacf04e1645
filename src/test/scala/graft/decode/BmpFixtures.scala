package graft.decode

/** Hand-built RFC 7854 / RFC 4271 byte fixtures shared by the decoder
  * and session-server specs.
  */
object BmpFixtures {
  def bytes(parts: Seq[Int]*): Array[Byte] =
    parts.flatten.map(_.toByte).toArray
  def u8(v: Int): Seq[Int] = Seq(v & 0xff)
  def u16(v: Int): Seq[Int] = Seq((v >> 8) & 0xff, v & 0xff)
  def u32(v: Long): Seq[Int] = Seq(((v >> 24) & 0xff).toInt,
    ((v >> 16) & 0xff).toInt, ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)

  def bmp(msgType: Int, body: Seq[Int]): Seq[Int] =
    u8(3) ++ u32(6L + body.length) ++ u8(msgType) ++ body

  def peerHdr(asn: Long, bgpId: Long, flags: Int = 0): Seq[Int] =
    u8(0) ++ u8(flags) ++ Seq.fill(8)(0) ++ Seq.fill(16)(0) ++
      u32(asn) ++ u32(bgpId) ++ Seq.fill(8)(0)

  def attr(t: Int, body: Seq[Int]): Seq[Int] =
    u8(0x40) ++ u8(t) ++ u8(body.length) ++ body

  def bgpUpdate(withdrawn: Seq[Int], attrs: Seq[Int],
      nlri: Seq[Int]): Seq[Int] = {
    val body = u16(withdrawn.length) ++ withdrawn ++
      u16(attrs.length) ++ attrs ++ nlri
    Seq.fill(16)(0xff) ++ u16(19 + body.length) ++ u8(2) ++ body
  }

  def pfx4(a: Int, b: Int, c: Int, plen: Int): Seq[Int] = {
    val full = Seq(a, b, c, 0)
    u8(plen) ++ full.take((plen + 7) / 8)
  }

  def asPath4(asns: Long*): Seq[Int] =
    u8(2) ++ u8(asns.length) ++ asns.flatMap(u32) // one AS_SEQUENCE

  /** Announce 10.0.0.0/24 and 10.0.0.0/16 from peer (65000, 10.0.0.1). */
  def announceMsg: Array[Byte] = bytes(bmp(0, peerHdr(65000, 0x0a000001L) ++
    bgpUpdate(Nil,
      attr(2, asPath4(65001L, 65002L)) ++
        attr(3, Seq(192, 0, 2, 1)) ++
        attr(8, u32(65001L * 65536 + 100)),
      pfx4(10, 0, 0, 24) ++ pfx4(10, 0, 0, 16))))

  def peerDownMsg: Array[Byte] =
    bytes(bmp(2, peerHdr(65000, 0x0a000001L) ++ u8(1)))
}
