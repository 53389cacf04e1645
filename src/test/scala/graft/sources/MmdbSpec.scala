package graft.sources

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Ip, Lpm}

/** MMDB reading against a spec-built fixture: a real binary tree
  * (record size 24), data section with maps/strings/uints, shared-key
  * POINTERS (how real files dedup), and the metadata map — walked into
  * LPM prefix entries and looked up end to end.
  */
class MmdbSpec extends AnyFunSuite {

  // --- fixture encoder (MaxMind-DB spec) -----------------------------

  private def ctrl(typ: Int, size: Int): Seq[Int] = {
    require(size < 285)
    val (szBits, extra) =
      if (size < 29) (size, Seq.empty[Int]) else (29, Seq(size - 29))
    if (typ < 8) Seq((typ << 5) | szBits) ++ extra
    else Seq(szBits, typ - 7) ++ extra // ext: ctrl, type byte, size bytes
  }
  private def s(v: String): Seq[Int] =
    ctrl(2, v.length) ++ v.getBytes("UTF-8").map(_ & 0xff)
  private def u(v: Long): Seq[Int] = { // uint32, minimal bytes
    val bytes = BigInt(v).toByteArray.dropWhile(_ == 0).map(_ & 0xff)
    ctrl(6, bytes.length) ++ bytes
  }
  private def m(n: Int): Seq[Int] = ctrl(7, n)
  private def arr(n: Int): Seq[Int] = Seq((0 << 5) | n, 11 - 7) // ext type 11
  private def ptr(target: Int): Seq[Int] = {
    require(target < 2048)
    Seq((1 << 5) | ((target >> 8) & 0x7), target & 0xff)
  }

  /** Two data records; the second reuses the "country"/"iso_code" key
    * strings via pointers, as real files do.
    */
  private def buildFixture(): Array[Byte] = {
    val data = mutable.ArrayBuffer.empty[Int]
    def emit(parts: Seq[Int]*): Int = { // returns the record's offset
      val off = data.length
      parts.foreach(data ++= _)
      off
    }
    // record A at offset 0: {"country": {"iso_code": "AU"},
    //   "autonomous_system_number": 13335,
    //   "autonomous_system_organization": "Cloudflare"}
    val countryKeyOff = data.length + 1 // "country" string starts after the map hdr
    emit(m(3))
    emit(s("country"))
    val isoKeyOff = data.length + 1 // inside the nested map
    emit(m(1), s("iso_code"), s("AU"))
    emit(s("autonomous_system_number"), u(13335L))
    emit(s("autonomous_system_organization"), s("Cloudflare"))
    // record B: {"country"*: {"iso_code"*: "FR"}, "city": {"names":
    //   {"en": "Paris"}}, "subdivisions": [{"iso_code"*: "IDF"}]}
    // (*) = pointer to the shared key string in record A
    val recB = emit(m(3),
      ptr(countryKeyOff), m(1), ptr(isoKeyOff), s("FR"),
      s("city"), m(1), s("names"), m(1), s("en"), s("Paris"),
      s("subdivisions"), arr(1), m(1), ptr(isoKeyOff), s("IDF"))

    // --- binary tree for 1.0.0.0/24 → A, 2.0.0.0/8 → B (ip_version 4)
    sealed trait Child
    case object Miss extends Child
    final case class Data(off: Int) extends Child
    final case class Sub(n: Node) extends Child
    final class Node { var l: Child = Miss; var r: Child = Miss }
    val root = new Node
    def insert(bits: Seq[Int], off: Int): Unit = {
      var cur = root
      bits.dropRight(1).foreach { b =>
        val next = (if (b == 0) cur.l else cur.r) match {
          case Sub(n) => n
          case Miss => val n = new Node
            if (b == 0) cur.l = Sub(n) else cur.r = Sub(n); n
          case Data(_) => fail("fixture prefixes must not nest")
        }
        cur = next
      }
      if (bits.last == 0) cur.l = Data(off) else cur.r = Data(off)
    }
    def bitsOf(cidr: String): Seq[Int] = {
      val Array(a, plen) = cidr.split("/")
      val addr = a.split("\\.").map(_.toInt)
      (0 until plen.toInt).map(i => (addr(i / 8) >> (7 - i % 8)) & 1)
    }
    insert(bitsOf("1.0.0.0/24"), 0)
    insert(bitsOf("2.0.0.0/8"), recB)

    // number nodes (preorder), then emit 24-bit records
    val nodes = mutable.ArrayBuffer.empty[Node]
    def collect(n: Node): Unit = {
      nodes += n
      Seq(n.l, n.r).foreach { case Sub(c) => collect(c); case _ => () }
    }
    collect(root)
    val index = nodes.zipWithIndex.toMap
    val nodeCount = nodes.length
    def recordValue(c: Child): Int = c match {
      case Miss => nodeCount
      case Sub(n) => index(n)
      case Data(off) => nodeCount + 16 + off
    }
    val tree = mutable.ArrayBuffer.empty[Int]
    nodes.foreach { n =>
      Seq(n.l, n.r).foreach { c =>
        val v = recordValue(c)
        tree ++= Seq((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
      }
    }

    val meta = m(6) ++
      s("binary_format_major_version") ++ u(2) ++
      s("binary_format_minor_version") ++ u(0) ++
      s("node_count") ++ u(nodeCount.toLong) ++
      s("record_size") ++ u(24L) ++
      s("ip_version") ++ u(4L) ++
      s("database_type") ++ s("Test-GeoLite2")

    (tree ++ Seq.fill(16)(0) ++ data ++
      Seq(0xAB, 0xCD, 0xEF) ++ "MaxMind.com".getBytes("US-ASCII").map(_ & 0xff)
      ++ meta).map(_.toByte).toArray
  }

  test("open + walk enumerates the networks with decoded attributes") {
    val db = Mmdb.open(buildFixture())
    assert(db.ipVersion == 4 && db.recordSize == 24)
    assert(db.databaseType == "Test-GeoLite2")
    val nets = db.networks().toMap
    assert(nets.keySet == Set("1.0.0.0/24", "2.0.0.0/8"))
    val a = nets("1.0.0.0/24").asInstanceOf[Map[String, Any]]
    assert(a("autonomous_system_number") == 13335L)
    assert(a("autonomous_system_organization") == "Cloudflare")
    val b = nets("2.0.0.0/8").asInstanceOf[Map[String, Any]]
    // pointer-shared keys decode like inline ones
    assert(b("country").asInstanceOf[Map[String, Any]]("iso_code") == "FR")
  }

  test("prefixEntries extracts the reference's field set") {
    val entries = Mmdb.prefixEntries(Mmdb.open(buildFixture()))
      .map(e => e.cidr -> e.attrs).toMap
    assert(entries("1.0.0.0/24") ==
      Map("country" -> "AU", "asn" -> "13335", "asorg" -> "Cloudflare"))
    assert(entries("2.0.0.0/8") ==
      Map("country" -> "FR", "city" -> "Paris", "state" -> "IDF"))
  }

  test("the walked entries resolve through the networks LPM") {
    val table = Lpm.Table.build(Mmdb.prefixEntries(Mmdb.open(buildFixture())))
    assert(table.lookup(Ip.parse("1.0.0.77")).get("country") == "AU")
    assert(table.lookup(Ip.parse("2.55.1.2")).get("city") == "Paris")
    assert(table.lookup(Ip.parse("9.9.9.9")).isEmpty)
  }

  test("ipinfo-convention records extract too") {
    // reuse the tree shape but with flat ipinfo-style data records
    val raw = buildFixture()
    // decode-level check is enough here: feed ipinfo-shaped maps through
    // the extraction path directly
    val db = Mmdb.open(raw)
    val entries = Mmdb.prefixEntriesFrom(Seq(
      "5.44.0.0/16" -> Map[String, Any]("country" -> "NL",
        "region" -> "North Holland", "city" -> "Amsterdam"),
      "5.45.0.0/16" -> Map[String, Any]("asn" -> "AS60068", "name" -> "Datacamp"),
      "5.46.0.0/16" -> Map[String, Any]("asn" -> "ASxx")) // malformed — skipped
    ).map(e => e.cidr -> e.attrs).toMap
    assert(entries("5.44.0.0/16") == Map("country" -> "NL",
      "state" -> "North Holland", "city" -> "Amsterdam"))
    assert(entries("5.45.0.0/16") == Map("asn" -> "60068", "asorg" -> "Datacamp"))
    assert(!entries.contains("5.46.0.0/16"))
    assert(db.networks().nonEmpty) // fixture still walks
  }

  test("a non-MMDB buffer is rejected") {
    intercept[IllegalArgumentException] {
      Mmdb.open(Array.fill[Byte](64)(7))
    }
  }
}
