package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IP address helpers over the canonical 16-byte binary representation
  * (IPv4 stored as IPv4-mapped-IPv6, reference
  * `console/query/column.go:206-212`).
  *
  * Scala-side codecs are used by the filter-DSL compiler to turn literals
  * into byte arrays; Column-side helpers render/truncate at query time.
  */
object Ip {

  private val v4Pattern = """^\d{1,3}(\.\d{1,3}){3}$""".r

  /** Parse an IPv4/IPv6 literal into the canonical 16 bytes. Rejects
    * non-literal input (never resolves hostnames).
    */
  def parse(s: String): Array[Byte] = {
    val isLiteral = v4Pattern.matches(s) ||
      (s.contains(':') && s.forall(c => c == ':' || c == '.' ||
        Character.digit(c, 16) >= 0))
    require(isLiteral, s"not an IP literal: $s")
    val addr = java.net.InetAddress.getByName(s)
    val raw = addr.getAddress
    if (raw.length == 16) raw
    else {
      // v4 → v4-mapped ::ffff:a.b.c.d
      val out = new Array[Byte](16)
      out(10) = -1; out(11) = -1
      System.arraycopy(raw, 0, out, 12, 4)
      out
    }
  }

  /** Unsigned lexicographic compare of two 16-byte addresses — the order
    * BinaryType comparisons use, i.e. uint128 order.
    */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  def isV4Mapped(b: Array[Byte]): Boolean =
    b.length == 16 && b.take(10).forall(_ == 0) && b(10) == -1 && b(11) == -1

  /** Render 16 bytes as the display string, stripping the v4-mapped prefix
    * (reference P9: `replaceRegexpOne(IPv6NumToString(addr),'^::ffff:','')`).
    */
  def render(b: Array[Byte]): String = {
    if (b == null) return null
    if (isV4Mapped(b)) (12 to 15).map(i => b(i) & 0xff).mkString(".")
    else {
      // RFC 5952-ish: java formats via InetAddress
      java.net.InetAddress.getByAddress(b).getHostAddress
    }
  }

  /** CIDR range [lo, hi] of `cidr` ("10.0.0.0/8" or "2001:db8::/32") in
    * canonical 16-byte space. v4 prefixes are offset by the 96-bit mapped
    * prefix (a /8 becomes a /104).
    */
  def cidrRange(cidr: String): (Array[Byte], Array[Byte]) = {
    val Array(ip, bitsS) = cidr.split("/")
    val base = parse(ip)
    val isV4 = ip.contains('.')
    val bits = bitsS.toInt + (if (isV4) 96 else 0)
    require(bits >= 0 && bits <= 128, s"invalid prefix length in $cidr")
    val lo = base.clone()
    val hi = base.clone()
    var i = 0
    while (i < 16) {
      val keep = math.max(0, math.min(8, bits - i * 8))
      val keepMask = 0xff00 >> keep & 0xff // high `keep` bits set
      lo(i) = (lo(i) & keepMask).toByte
      hi(i) = (hi(i) | (~keepMask & 0xff)).toByte
      i += 1
    }
    (lo, hi)
  }

  /** Mask `b` to its first `bits` bits (prefix truncation). */
  def truncate(b: Array[Byte], bits: Int): Array[Byte] = {
    val out = b.clone()
    var i = 0
    while (i < 16) {
      val keep = math.max(0, math.min(8, bits - i * 8))
      out(i) = (out(i) & (0xff00 >> keep & 0xff)).toByte
      i += 1
    }
    out
  }



  /** `::ffff:10.a.b.c` from the low 24 bits of a non-negative long —
    * the synthetic-address builder of the test-harness fact mappings,
    * composed from codegen'd built-ins (hex/lpad/unhex/concat) so the
    * events→flows projection stays inside whole-stage codegen; the Scala
    * UDF it replaces broke codegen at every fact scan.
    */
  def v4Mapped10(tail24: Column): Column = {
    import org.apache.spark.sql.functions.{concat, hex, lit, lpad, pmod, unhex}
    val prefix = Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, -1, 10)
    concat(lit(prefix), unhex(lpad(hex(pmod(tail24, lit(16777216L))), 6, "0")))
  }

  /** Display rendering of a 16-byte address column (P9) — native
    * expression, see [[graft.expressions.IpToString]].
    */
  def ipToString(c: Column): Column = graft.expressions.IpToString(c)

  /** Privacy/aggregation truncation of an address column (P11) — native
    * expression keeping v4bits for v4-mapped, v6bits otherwise (reference
    * `console/graph.go:44-88`).
    */
  def ipTruncate(c: Column, v4bits: Int, v6bits: Int): Column =
    graft.expressions.IpTruncate(c, v4bits, v6bits)

  /** BETWEEN lo AND hi subnet containment over the canonical bytes.
    * BinaryType comparison in Spark is unsigned lexicographic, so 16-byte
    * fixed-width comparisons order exactly like uint128
    * (reference `helpers.go:288-313` compiles `<<` the same way).
    */
  def inSubnet(c: Column, cidr: String): Column = {
    val (lo, hi) = cidrRange(cidr)
    c >= lit(lo) && c <= lit(hi)
  }
}
