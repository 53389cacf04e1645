package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IpSpec extends SparkSpec {

  test("parse stores IPv4 as v4-mapped IPv6") {
    val b = Ip.parse("192.0.2.1")
    assert(b.length == 16)
    assert(Ip.isV4Mapped(b))
    assert(Ip.render(b) == "192.0.2.1")
  }

  test("parse/render IPv6 round-trip") {
    val b = Ip.parse("2001:db8::1")
    assert(!Ip.isV4Mapped(b))
    assert(Ip.render(b) == "2001:db8:0:0:0:0:0:1")
  }

  test("cidrRange v4 /24") {
    val (lo, hi) = Ip.cidrRange("192.0.2.0/24")
    assert(Ip.render(lo) == "192.0.2.0")
    assert(Ip.render(hi) == "192.0.2.255")
  }

  test("cidrRange v6 /32") {
    val (lo, hi) = Ip.cidrRange("2001:db8::/32")
    assert(Ip.render(lo) == "2001:db8:0:0:0:0:0:0")
    assert(hi.drop(4).forall(_ == -1))
  }

  test("truncate masks low bits") {
    val t = Ip.truncate(Ip.parse("10.1.2.3"), 96 + 24)
    assert(Ip.render(t) == "10.1.2.0")
  }

  test("binary comparison is unsigned lexicographic (high-bit addresses)") {
    // 128.0.0.1 has the high bit set in its first v4 byte; a signed byte
    // comparison would order it before 10.0.0.1.
    import spark.implicits._
    val df = Seq(Ip.parse("10.0.0.1"), Ip.parse("128.0.0.1"), Ip.parse("200.0.0.1"))
      .toDF("addr")
    val in = df.where(Ip.inSubnet(col("addr"), "128.0.0.0/8")).collect()
    assert(in.length == 1)
    assert(Ip.render(in(0).getAs[Array[Byte]](0)) == "128.0.0.1")
    val below = df.where(Ip.inSubnet(col("addr"), "0.0.0.0/1")).collect()
    assert(below.length == 1) // only 10.0.0.1
  }

  test("ipTruncate column keeps v4/v6 family bits") {
    import spark.implicits._
    val df = Seq(Ip.parse("10.1.2.3"), Ip.parse("2001:db8:1:2:3:4:5:6")).toDF("addr")
    val out = df.select(Ip.ipToString(Ip.ipTruncate(col("addr"), 24, 48))).as[String].collect()
    assert(out.contains("10.1.2.0"))
    assert(out.contains("2001:db8:1:0:0:0:0:0"))
  }
}
