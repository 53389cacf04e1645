package graft.decode

import org.scalatest.funsuite.AnyFunSuite
import graft.decode.BmpDecoder._
import graft.functions.{Ip, Rib}
import BmpFixtures._

/** BMP wire sessions end to end: hand-built RFC 7854 byte messages →
  * decode → [[Rib.Live]] → LPM lookups, including the 2-octet-AS flag,
  * MP_REACH/MP_UNREACH v6, partial-tail framing, and malformed
  * containment.
  */
class BmpDecoderSpec extends AnyFunSuite {

  test("route monitoring announces into a live RIB; lookups resolve") {
    val live = new Rib.Live
    val (events, consumed) = messages(announceMsg)
    assert(consumed == announceMsg.length)
    assert(events.collect { case a: Announce => a }.size == 2)
    val counts = feed(live, events)
    assert(counts("announce") == 2)

    val r = live.table.lookup(Ip.parse("10.0.0.7"), null)
    assert(r != null)
    assert(r.asn == 65002L) // origin = last AS of the path
    assert(r.asPath.toSeq == Seq(65001L, 65002L))
    assert(Ip.render(r.nextHop) == "192.0.2.1")
    assert(r.communities.toSeq == Seq(65001L * 65536 + 100))
    assert(r.netMask == 24)
    assert(live.table.lookup(Ip.parse("10.0.9.9"), null).netMask == 16)
  }

  test("withdraw and peer-down mutate in wire order") {
    val live = new Rib.Live
    feed(live, messages(announceMsg)._1)
    // withdraw the /24 only
    val wd = bytes(bmp(0, peerHdr(65000, 0x0a000001L) ++
      bgpUpdate(pfx4(10, 0, 0, 24), Nil, Nil)))
    val counts = feed(live, messages(wd)._1)
    assert(counts("withdraw") == 1)
    assert(live.table.lookup(Ip.parse("10.0.0.7"), null).netMask == 16)
    // peer down flushes the rest
    val down = bytes(bmp(2, peerHdr(65000, 0x0a000001L) ++ u8(1)))
    feed(live, messages(down)._1)
    assert(live.table.lookup(Ip.parse("10.0.9.9"), null) == null)
  }

  test("the A flag switches AS_PATH to 2-octet ASes") {
    val live = new Rib.Live
    val msg = bytes(bmp(0, peerHdr(64999, 7, flags = 0x20) ++
      bgpUpdate(Nil,
        Seq(0x40, 2, 4, 2, 1) ++ u16(64501) ++ // AS_SEQUENCE of one 2-byte AS
          attr(3, Seq(192, 0, 2, 9)),
        pfx4(10, 9, 0, 16))))
    feed(live, messages(msg)._1)
    val r = live.table.lookup(Ip.parse("10.9.1.1"), null)
    assert(r.asn == 64501L && r.asPath.toSeq == Seq(64501L))
  }

  test("an empty AS path falls back to the peer AS") {
    val live = new Rib.Live
    val msg = bytes(bmp(0, peerHdr(64777, 9) ++
      bgpUpdate(Nil, attr(3, Seq(192, 0, 2, 3)), pfx4(10, 8, 0, 16))))
    feed(live, messages(msg)._1)
    assert(live.table.lookup(Ip.parse("10.8.0.1"), null).asn == 64777L)
  }

  test("MP_REACH announces v6; MP_UNREACH withdraws it") {
    val live = new Rib.Live
    val v6pfx = u8(32) ++ Seq(0x20, 0x01, 0x0d, 0xb8) // 2001:db8::/32
    val nh = Seq(0x20, 0x01, 0x0d, 0xb8) ++ Seq.fill(11)(0) ++ Seq(1)
    val reach = bytes(bmp(0, peerHdr(65100, 11) ++
      bgpUpdate(Nil,
        attr(2, asPath4(65100L)) ++
          attr(14, u16(2) ++ u8(1) ++ u8(16) ++ nh ++ u8(0) ++ v6pfx),
        Nil)))
    feed(live, messages(reach)._1)
    val r = live.table.lookup(Ip.parse("2001:db8::42"), null)
    assert(r != null && r.asn == 65100L && r.netMask == 32)
    assert(r.nextHop.toSeq == Ip.parse("2001:db8::1").toSeq)

    val unreach = bytes(bmp(0, peerHdr(65100, 11) ++
      bgpUpdate(Nil, attr(15, u16(2) ++ u8(1) ++ v6pfx), Nil)))
    feed(live, messages(unreach)._1)
    assert(live.table.lookup(Ip.parse("2001:db8::42"), null) == null)
  }

  test("partial tails wait; the remainder decodes on the next read") {
    val two = announceMsg ++ bytes(bmp(4, Nil)) // announce + initiation
    val cut = announceMsg.length + 3 // initiation split mid-header
    val (e1, c1) = messages(two.take(cut))
    assert(c1 == announceMsg.length && e1.size == 2)
    val (e2, c2) = messages(two.drop(c1))
    assert(e2 == Seq(Initiation) && c2 == two.length - c1)
  }

  test("a truncated body is contained; framing advances past it") {
    // declared length covers only half the peer header
    val bad = bytes(bmp(2, peerHdr(65000, 1).take(10)))
    val (events, consumed) = messages(bad ++ bytes(bmp(5, Nil)))
    assert(events.head.isInstanceOf[Malformed])
    assert(events.last == Termination)
    assert(consumed == bad.length + 6)
  }

  test("a non-BMP buffer cannot desynchronize the reader") {
    val junk = Array.fill[Byte](32)(0x41)
    val (events, consumed) = messages(junk)
    assert(events.exists(_.isInstanceOf[Malformed]))
    assert(consumed == junk.length)
  }
}
