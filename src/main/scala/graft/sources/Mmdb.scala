package graft.sources

import graft.functions.Lpm

/** MaxMind DB (MMDB) reader — the GeoIP snapshot format the reference
  * walks into its networks trie (`outlet/geoip/iter_maxminddb.go`,
  * public spec: maxmind.github.io/MaxMind-DB). Graft consumes GeoIP the
  * same way: ENUMERATE the whole database once into
  * [[Lpm.PrefixEntry]] rows (country / city / state / asn / asorg
  * attributes) and merge them into the networks LPM table — per-lookup
  * MMDB reads never happen on the data plane, only at (re)build time,
  * which is also why only the decoder surface the walk needs exists
  * here (tree records of size 24/28/32, the data types GeoLite2 files
  * actually contain, pointers, and the metadata map).
  */
object Mmdb {

  private val MetadataMarker: Array[Byte] =
    Array(0xAB, 0xCD, 0xEF).map(_.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  final case class Database(
      nodeCount: Int, recordSize: Int, ipVersion: Int,
      databaseType: String, buf: Array[Byte], dataStart: Int) {

    private val nodeBytes = recordSize * 2 / 8

    /** Record `side` (0 = left/0-bit, 1 = right/1-bit) of `node`. */
    def record(node: Int, side: Int): Int = {
      val base = node * nodeBytes
      recordSize match {
        case 24 =>
          val o = base + side * 3
          ((buf(o) & 0xff) << 16) | ((buf(o + 1) & 0xff) << 8) | (buf(o + 2) & 0xff)
        case 28 =>
          val mid = buf(base + 3) & 0xff
          val hi = if (side == 0) mid >> 4 else mid & 0x0f
          val o = if (side == 0) base else base + 4
          (hi << 24) | ((buf(o) & 0xff) << 16) | ((buf(o + 1) & 0xff) << 8) |
            (buf(o + 2) & 0xff)
        case 32 =>
          val o = base + side * 4
          ((buf(o) & 0xff) << 24) | ((buf(o + 1) & 0xff) << 16) |
            ((buf(o + 2) & 0xff) << 8) | (buf(o + 3) & 0xff)
        case other => throw new IllegalArgumentException(
          s"unsupported record size $other")
      }
    }

    /** Decode the data record a tree record points to. */
    def dataAt(recordValue: Int): Any =
      decodeValue(buf, dataStart + (recordValue - nodeCount - 16), dataStart)._1

    /** Depth-first enumeration of every network in the tree. */
    def networks(): Seq[(String, Any)] = {
      val out = Seq.newBuilder[(String, Any)]
      val maxDepth = if (ipVersion == 4) 32 else 128
      def walk(node: Int, bits: List[Int]): Unit = {
        if (node == nodeCount || bits.length > maxDepth) return
        if (node > nodeCount) {
          out += ((cidr(bits), dataAt(node)))
        } else {
          walk(record(node, 0), 0 :: bits)
          walk(record(node, 1), 1 :: bits)
        }
      }
      walk(record(0, 0), List(0))
      walk(record(0, 1), List(1))
      out.result()
    }

    private def cidr(bitsRev: List[Int]): String = {
      val bits = bitsRev.reverse
      val size = if (ipVersion == 4) 4 else 16
      val addr = new Array[Byte](size)
      bits.zipWithIndex.foreach { case (b, i) =>
        if (b == 1) addr(i / 8) = (addr(i / 8) | (0x80 >> (i % 8))).toByte
      }
      java.net.InetAddress.getByAddress(addr).getHostAddress + "/" + bits.length
    }
  }

  /** Open an MMDB byte image (metadata parse + section offsets). */
  def open(buf: Array[Byte]): Database = {
    val metaStart = lastIndexOf(buf, MetadataMarker)
    require(metaStart >= 0, "not an MMDB file: metadata marker missing")
    val metaOff = metaStart + MetadataMarker.length
    val meta = decodeValue(buf, metaOff, metaOff)._1
      .asInstanceOf[Map[String, Any]]
    def num(k: String): Long = meta(k) match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(s"bad metadata $k: $other")
    }
    val nodeCount = num("node_count").toInt
    val recordSize = num("record_size").toInt
    // Long math: nodeCount * recordSize * 2 overflows Int around 34M
    // nodes at record size 32 even though the byte count fits an array.
    val dataStartL = nodeCount.toLong * recordSize * 2 / 8 + 16
    require(dataStartL <= buf.length,
      s"MMDB tree section ($dataStartL bytes) exceeds image (${buf.length})")
    val dataStart = dataStartL.toInt
    Database(nodeCount, recordSize, num("ip_version").toInt,
      meta.getOrElse("database_type", "").toString, buf, dataStart)
  }

  def openFile(path: String): Database =
    open(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** Attribute extraction covering BOTH database conventions the
    * reference reads: GeoLite2/MaxMind (`iter_maxminddb.go:27-160` —
    * nested maps, `iso_code`, numeric ASN) and ipinfo
    * (`iter_ipinfo.go:18-76` — flat strings, `region` for state, ASN
    * as "ASnnnn"). One flattened attrs map per network, ready for the
    * networks LPM merge.
    */
  def prefixEntries(db: Database): Seq[Lpm.PrefixEntry] =
    prefixEntriesFrom(db.networks())

  /** Extraction over raw (cidr, decoded data) pairs. */
  def prefixEntriesFrom(nets: Seq[(String, Any)]): Seq[Lpm.PrefixEntry] =
    nets.flatMap { case (cidr, data) =>
      data match {
        case m: Map[String @unchecked, Any @unchecked] =>
          val attrs = Map.newBuilder[String, String]
          m.get("country").collect { case c: Map[String @unchecked, Any @unchecked] =>
            c.get("iso_code").foreach(v => attrs += "country" -> v.toString)
          }
          // ipinfo convention: flat strings + "ASnnnn"
          m.get("country").collect { case s: String => attrs += "country" -> s }
          m.get("region").collect { case s: String => attrs += "state" -> s }
          m.get("city").collect { case s: String => attrs += "city" -> s }
          m.get("asn").collect {
            case s: String if s.startsWith("AS") &&
                s.drop(2).forall(_.isDigit) && s.length > 2 =>
              attrs += "asn" -> s.drop(2)
          }
          m.get("name").collect { case s: String =>
            if (m.contains("asn")) attrs += "asorg" -> s
          }
          m.get("subdivisions").collect { case subs: Vector[Any @unchecked] =>
            subs.headOption.collect { case s: Map[String @unchecked, Any @unchecked] =>
              s.get("iso_code").foreach(v => attrs += "state" -> v.toString)
            }
          }
          m.get("city").collect { case c: Map[String @unchecked, Any @unchecked] =>
            c.get("names").collect { case n: Map[String @unchecked, Any @unchecked] =>
              n.get("en").foreach(v => attrs += "city" -> v.toString)
            }
          }
          m.get("autonomous_system_number")
            .foreach(v => attrs += "asn" -> v.toString)
          m.get("autonomous_system_organization")
            .foreach(v => attrs += "asorg" -> v.toString)
          val a = attrs.result()
          if (a.isEmpty) None else Some(Lpm.PrefixEntry(cidr, a))
        case _ => None
      }
    }

  // --- data-section decoder -------------------------------------------

  /** Decode the value at `off`; `dataStart` anchors pointer targets.
    * Returns (value, offset past the value).
    */
  private def decodeValue(buf: Array[Byte], off: Int, dataStart: Int): (Any, Int) = {
    val ctrl = buf(off) & 0xff
    var typ = ctrl >> 5
    var pos = off + 1
    if (typ == 0) { typ = (buf(pos) & 0xff) + 7; pos += 1 }

    if (typ == 1) { // pointer: SS in bits 3-4, VVV in bits 0-2
      val ss = (ctrl >> 3) & 0x3
      val vvv = ctrl & 0x7
      var target = 0
      ss match {
        case 0 => target = (vvv << 8) | (buf(pos) & 0xff); pos += 1
        case 1 => target = ((vvv << 16) | ((buf(pos) & 0xff) << 8) |
          (buf(pos + 1) & 0xff)) + 2048; pos += 2
        case 2 => target = ((vvv << 24) | ((buf(pos) & 0xff) << 16) |
          ((buf(pos + 1) & 0xff) << 8) | (buf(pos + 2) & 0xff)) + 526336
          pos += 3
        case _ => target = ((buf(pos) & 0xff) << 24) | ((buf(pos + 1) & 0xff) << 16) |
          ((buf(pos + 2) & 0xff) << 8) | (buf(pos + 3) & 0xff); pos += 4
      }
      val (v, _) = decodeValue(buf, dataStart + target, dataStart)
      return (v, pos)
    }

    var size = ctrl & 0x1f
    if (size == 29) { size = 29 + (buf(pos) & 0xff); pos += 1 }
    else if (size == 30) {
      size = 285 + ((buf(pos) & 0xff) << 8) + (buf(pos + 1) & 0xff); pos += 2
    } else if (size == 31) {
      size = 65821 + ((buf(pos) & 0xff) << 16) +
        ((buf(pos + 1) & 0xff) << 8) + (buf(pos + 2) & 0xff)
      pos += 3
    }

    typ match {
      case 2 => (new String(buf, pos, size, "UTF-8"), pos + size)
      case 3 =>
        require(size == 8, "bad double size")
        (java.lang.Double.longBitsToDouble(beLong(buf, pos, 8)), pos + 8)
      case 4 => (java.util.Arrays.copyOfRange(buf, pos, pos + size), pos + size)
      case 5 | 6 | 9 => (beLong(buf, pos, size), pos + size) // uint16/32/64
      case 8 => // int32 (always signed, size ≤ 4)
        var v = if (size > 0 && (buf(pos) & 0x80) != 0) -1L else 0L
        (0 until size).foreach(i => v = (v << 8) | (buf(pos + i) & 0xff))
        (v, pos + size)
      case 10 => (BigInt(1, java.util.Arrays.copyOfRange(buf, pos, pos + size)),
        pos + size)
      case 7 => // map: size pairs of (string key, value)
        var p = pos
        val m = Map.newBuilder[String, Any]
        (0 until size).foreach { _ =>
          val (k, p1) = decodeValue(buf, p, dataStart)
          val (v, p2) = decodeValue(buf, p1, dataStart)
          m += k.toString -> v
          p = p2
        }
        (m.result(), p)
      case 11 => // array
        var p = pos
        val a = Vector.newBuilder[Any]
        (0 until size).foreach { _ =>
          val (v, p1) = decodeValue(buf, p, dataStart)
          a += v
          p = p1
        }
        (a.result(), p)
      case 14 => (size != 0, pos) // bool: size IS the value
      case 15 =>
        require(size == 4, "bad float size")
        (java.lang.Float.intBitsToFloat(beLong(buf, pos, 4).toInt).toDouble,
          pos + 4)
      case other =>
        throw new IllegalArgumentException(s"unsupported MMDB type $other")
    }
  }

  private def beLong(buf: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    (0 until n).foreach(i => v = (v << 8) | (buf(off + i) & 0xff))
    v
  }

  private def lastIndexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = hay.length - needle.length
    while (i >= 0) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i -= 1
    }
    -1
  }
}
