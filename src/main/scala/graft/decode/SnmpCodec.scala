package graft.decode

/** Minimal BER codec for SNMPv2c GET — exactly the wire surface the
  * reference's metadata poller speaks
  * (`outlet/metadata/provider/snmp/poller.go:118-160`): one GetRequest
  * of scalar OIDs per (exporter, ifIndex), one GetResponse back. Not a
  * general ASN.1 stack: the five tags SNMPv2c responses actually carry
  * (INTEGER, OCTET STRING, NULL, OID, the Counter/Gauge/TimeTicks
  * application integers) plus the v2 noSuch* context markers.
  */
object SnmpCodec {

  sealed trait Value
  final case class IntVal(v: Long) extends Value
  final case class StrVal(v: String) extends Value
  case object NullVal extends Value
  /** noSuchObject(0x80) / noSuchInstance(0x81) / endOfMibView(0x82). */
  final case class NoSuch(tag: Int) extends Value

  final case class VarBind(oid: String, value: Value)
  final case class Pdu(requestId: Long, errorStatus: Int,
      varBinds: Seq[VarBind])

  // --- BER primitives ------------------------------------------------

  private def lenBytes(n: Int): Seq[Byte] =
    if (n < 0x80) Seq(n.toByte)
    else {
      val raw = BigInt(n).toByteArray.dropWhile(_ == 0)
      ((0x80 | raw.length).toByte +: raw).toSeq
    }

  private def tlv(tag: Int, body: Array[Byte]): Array[Byte] =
    (tag.toByte +: lenBytes(body.length)) .toArray ++ body

  private def berInt(v: Long): Array[Byte] = {
    var raw = BigInt(v).toByteArray
    if (raw.isEmpty) raw = Array(0.toByte)
    tlv(0x02, raw)
  }

  private def berStr(s: String): Array[Byte] =
    tlv(0x04, s.getBytes("UTF-8"))

  /** Dotted OID → BER: first two arcs fold into one byte, the rest are
    * base-128 varints.
    */
  def oidBytes(oid: String): Array[Byte] = {
    val arcs = oid.split('.').map(_.toLong)
    require(arcs.length >= 2, s"bad OID $oid")
    val out = scala.collection.mutable.ArrayBuffer[Byte](
      (arcs(0) * 40 + arcs(1)).toByte)
    arcs.drop(2).foreach { a =>
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var v = a
      chunks.prepend((v & 0x7f).toByte)
      v >>= 7
      while (v > 0) { chunks.prepend(((v & 0x7f) | 0x80).toByte); v >>= 7 }
      out ++= chunks
    }
    tlv(0x06, out.toArray)
  }

  /** SNMPv2c GetRequest message for `oids`. */
  def getRequest(community: String, requestId: Long,
      oids: Seq[String]): Array[Byte] = {
    val binds = oids.map(o => tlv(0x30, oidBytes(o) ++ tlv(0x05, Array.empty)))
    val pdu = tlv(0xA0,
      berInt(requestId) ++ berInt(0) ++ berInt(0) ++
        tlv(0x30, binds.foldLeft(Array.empty[Byte])(_ ++ _)))
    tlv(0x30, berInt(1) ++ berStr(community) ++ pdu)
  }

  /** SNMPv2c GetResponse — the agent side (spec fixtures + any stub). */
  def getResponse(community: String, requestId: Long, errorStatus: Int,
      binds: Seq[VarBind]): Array[Byte] = {
    val encoded = binds.map { b =>
      val v = b.value match {
        case IntVal(n) => berInt(n)
        case StrVal(s) => berStr(s)
        case NullVal => tlv(0x05, Array.empty)
        case NoSuch(t) => tlv(t, Array.empty)
      }
      tlv(0x30, oidBytes(b.oid) ++ v)
    }
    val pdu = tlv(0xA2,
      berInt(requestId) ++ berInt(errorStatus.toLong) ++ berInt(0) ++
        tlv(0x30, encoded.foldLeft(Array.empty[Byte])(_ ++ _)))
    tlv(0x30, berInt(1) ++ berStr(community) ++ pdu)
  }

  // --- decode --------------------------------------------------------

  private final class Ber(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def header(): (Int, Int) = { // (tag, length), advances past header
      // Containment: a sub-reader at its logical end must throw, never
      // read sibling bytes from the same datagram.
      require(pos + 2 <= end, "truncated BER header")
      val tag = bytes(pos) & 0xff
      pos += 1
      var len = bytes(pos) & 0xff
      pos += 1
      if ((len & 0x80) != 0) {
        val n = len & 0x7f
        require(n >= 1 && n <= 4 && pos + n <= end, "bad BER length")
        len = 0
        (0 until n).foreach { _ => len = (len << 8) | (bytes(pos) & 0xff); pos += 1 }
      }
      require(len >= 0 && pos + len <= end, "BER length overruns buffer")
      (tag, len)
    }
    def sub(len: Int): Ber = { val b = new Ber(bytes, pos, pos + len); pos += len; b }
    def int(len: Int): Long = {
      require(pos + len <= end, "BER integer overruns container")
      var v = if (len > 0 && (bytes(pos) & 0x80) != 0) -1L else 0L
      (0 until len).foreach { _ => v = (v << 8) | (bytes(pos) & 0xff); pos += 1 }
      v
    }
    def str(len: Int): String = {
      require(pos + len <= end, "BER string overruns container")
      val s = new String(bytes, pos, len, "UTF-8"); pos += len; s
    }
    def oid(len: Int): String = {
      require(len >= 1 && pos + len <= end, "BER OID overruns container")
      val stop = pos + len
      val first = bytes(pos) & 0xff
      pos += 1
      val sb = new StringBuilder
      sb.append(first / 40).append('.').append(first % 40)
      var cur = 0L
      while (pos < stop) {
        val b = bytes(pos) & 0xff
        pos += 1
        cur = (cur << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) { sb.append('.').append(cur); cur = 0L }
      }
      sb.toString
    }
    def skip(len: Int): Unit = pos += len
  }

  /** Decode an SNMPv2c message; returns (community, pdu). Works for
    * both requests (0xA0) and responses (0xA2) — the agent stub decodes
    * requests with it too. EVERY malformed input fails as
    * `IllegalArgumentException` — the one failure mode the poller
    * catches; a truncated buffer must not escape as a bounds error.
    */
  def decode(bytes: Array[Byte]): (String, Pdu) =
    try decodeUnsafe(bytes)
    catch {
      case e: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(s"truncated SNMP message: $e")
    }

  private def decodeUnsafe(bytes: Array[Byte]): (String, Pdu) = {
    val b = new Ber(bytes, 0, bytes.length)
    val (t0, l0) = b.header()
    require(t0 == 0x30, "not a SEQUENCE")
    val m = b.sub(l0)
    val (tv, lv) = m.header(); require(tv == 0x02, "bad version tag")
    m.int(lv) // version
    val (tc, lc) = m.header(); require(tc == 0x04, "bad community tag")
    val community = m.str(lc)
    val (tp, lp) = m.header()
    require(tp == 0xA0 || tp == 0xA2, s"unexpected PDU tag $tp")
    val p = m.sub(lp)
    val (t1, l1) = p.header(); require(t1 == 0x02, "bad request-id")
    val reqId = p.int(l1)
    val (t2, l2) = p.header(); require(t2 == 0x02, "bad error-status")
    val errSt = p.int(l2).toInt
    val (t3, l3) = p.header(); require(t3 == 0x02, "bad error-index")
    p.int(l3)
    val (t4, l4) = p.header(); require(t4 == 0x30, "bad varbind list")
    val vbl = p.sub(l4)
    val binds = Seq.newBuilder[VarBind]
    while (vbl.hasMore) {
      val (tb, lb) = vbl.header(); require(tb == 0x30, "bad varbind")
      val vb = vbl.sub(lb)
      val (to, lo) = vb.header(); require(to == 0x06, "bad OID tag")
      val oid = vb.oid(lo)
      val (tvv, lvv) = vb.header()
      val value = tvv match {
        case 0x02 | 0x41 | 0x42 | 0x43 | 0x46 => IntVal(vb.int(lvv))
        case 0x04 => StrVal(vb.str(lvv))
        case 0x05 => vb.skip(lvv); NullVal
        case 0x80 | 0x81 | 0x82 => vb.skip(lvv); NoSuch(tvv)
        case other => vb.skip(lvv); NoSuch(other)
      }
      binds += VarBind(oid, value)
    }
    (community, Pdu(reqId, errSt, binds.result()))
  }
}
