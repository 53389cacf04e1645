package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** J4: next-hop-preferring RIB selection (reference
  * `outlet/routing/provider/bmp/rib.go:451-492`, `bmp/lookup.go:24-50`).
  */
class RibSpec extends SparkSpec {
  import spark.implicits._

  private val table = Rib.Table.build(Seq(
    Rib.RouteEntry("10.0.0.0/24", Rib.Route("192.0.2.1", 65001,
      asPath = Seq(64500L, 65001L), communities = Seq(650010L))),
    Rib.RouteEntry("10.0.0.0/24", Rib.Route("192.0.2.2", 65002,
      asPath = Seq(64500L, 65002L))),
    Rib.RouteEntry("10.0.0.0/16", Rib.Route("192.0.2.3", 65100)),
    Rib.RouteEntry("2001:db8::/32", Rib.Route("2001:db8::1", 65200))))

  test("longest prefix wins; first route is the fallback") {
    val r = table.lookup(Ip.parse("10.0.0.7"), null)
    assert(r.asn == 65001) // first route of the /24, not the /16
    assert(r.netMask == 24) // v4-adjusted
    assert(r.asPath.toSeq == Seq(64500L, 65001L))
    assert(Ip.render(r.nextHop) == "192.0.2.1")
    // outside the /24 but inside the /16
    assert(table.lookup(Ip.parse("10.0.9.9"), null).asn == 65100)
    assert(table.lookup(Ip.parse("10.0.9.9"), null).netMask == 16)
    // miss
    assert(table.lookup(Ip.parse("203.0.113.1"), null) == null)
  }

  test("a route matching the preferred next hop overrides the first") {
    val r = table.lookup(Ip.parse("10.0.0.7"), Ip.parse("192.0.2.2"))
    assert(r.asn == 65002)
    assert(Ip.render(r.nextHop) == "192.0.2.2")
    // a preferred next hop no route carries falls back to the first
    assert(table.lookup(Ip.parse("10.0.0.7"), Ip.parse("192.0.2.9")).asn == 65001)
  }

  test("v6 masks are not v4-adjusted") {
    val r = table.lookup(Ip.parse("2001:db8::42"), null)
    assert(r.asn == 65200 && r.netMask == 32)
  }

  test("lookup columns work inside a codegen'd plan") {
    val df = Seq(
      (Ip.parse("10.0.0.7"), Ip.parse("192.0.2.2")),
      (Ip.parse("10.0.0.7"), null),
      (Ip.parse("203.0.113.1"), null))
      .toDF("addr", "nh")
    val out = df.select(
      Rib.lookup(table, "asn")(col("addr"), col("nh")).as("asn"),
      Rib.lookup(table, "netmask")(col("addr"), col("nh")).as("mask"),
      Rib.lookup(table, "aspath")(col("addr"), col("nh")).as("path"),
      Ip.ipToString(Rib.lookup(table, "nexthop")(col("addr"), col("nh")))
        .as("nh_out"))
      .collect()
    assert(out(0).getAs[Long]("asn") == 65002L)
    assert(out(0).getAs[scala.collection.Seq[Long]]("path").toSeq ==
      Seq(64500L, 65002L))
    assert(out(0).getAs[String]("nh_out") == "192.0.2.2")
    assert(out(1).getAs[Long]("asn") == 65001L)
    assert(out(2).isNullAt(0) && out(2).isNullAt(3))
  }

  // rib.go:315-404 + events.go:100-146 — the BMP session lifecycle over
  // the rebuild-on-change Live wrapper
  test("announce → withdraw: lookups fall through to the covering prefix") {
    val live = new Rib.Live
    live.announce(1L, "10.0.0.0/16", Rib.Route("192.0.2.3", 65100))
    assert(live.announce(1L, "10.0.0.0/24", Rib.Route("192.0.2.1", 65001)))
    assert(live.table.lookup(Ip.parse("10.0.0.7"), null).asn == 65001)
    // withdraw the /24: the prefix leaves the tree, the /16 takes over
    assert(live.withdraw(1L, "10.0.0.0/24"))
    val after = live.table.lookup(Ip.parse("10.0.0.7"), null)
    assert(after.asn == 65100 && after.netMask == 16)
    // withdrawing again (or from a peer with no route) is a no-op
    assert(!live.withdraw(1L, "10.0.0.0/24"))
    assert(!live.withdraw(9L, "10.0.0.0/16"))
  }

  test("re-announcement updates in place and keeps fallback order") {
    val live = new Rib.Live
    live.announce(1L, "10.0.0.0/24", Rib.Route("192.0.2.1", 65001))
    live.announce(2L, "10.0.0.0/24", Rib.Route("192.0.2.2", 65002))
    assert(live.table.lookup(Ip.parse("10.0.0.7"), null).asn == 65001)
    // peer 1 re-announces with a new AS — an UPDATE (rib.go:356-363), so
    // its route keeps first position and stays the fallback selection
    assert(!live.announce(1L, "10.0.0.0/24", Rib.Route("192.0.2.1", 64999)))
    val r = live.table.lookup(Ip.parse("10.0.0.7"), null)
    assert(r.asn == 64999 && Ip.render(r.nextHop) == "192.0.2.1")
    // the preferred-next-hop override still selects peer 2's route
    assert(live.table.lookup(Ip.parse("10.0.0.7"), Ip.parse("192.0.2.2"))
      .asn == 65002)
  }

  test("peer-down flushes every route of the peer in one sweep") {
    val live = new Rib.Live
    live.announce(1L, "10.0.0.0/24", Rib.Route("192.0.2.1", 65001))
    live.announce(1L, "10.1.0.0/24", Rib.Route("192.0.2.1", 65001))
    live.announce(2L, "10.0.0.0/24", Rib.Route("192.0.2.2", 65002))
    live.announce(2L, "10.0.0.0/16", Rib.Route("192.0.2.3", 65100))
    // FlushPeer contract: (routesRemoved, prefixesRemoved) — peer 1 owned
    // 2 routes; only 10.1.0.0/24 emptied (10.0.0.0/24 keeps peer 2's)
    assert(live.peerDown(1L) == ((2, 1)))
    assert(live.table.lookup(Ip.parse("10.1.0.5"), null) == null)
    val surv = live.table.lookup(Ip.parse("10.0.0.7"), null)
    assert(surv.asn == 65002, "peer 2's route must survive the flush")
    // flushing an unknown peer removes nothing
    assert(live.peerDown(7L) == ((0, 0)))
  }

  test("snapshot is rebuilt only when the route set changes") {
    val live = new Rib.Live
    live.announce(1L, "10.0.0.0/24", Rib.Route("192.0.2.1", 65001))
    val t1 = live.table
    assert(live.table eq t1) // no mutation → same instance
    live.announce(1L, "10.0.0.0/24", Rib.Route("192.0.2.1", 65001))
    assert(!(live.table eq t1)) // update (even same-value) → republished
    val t2 = live.table
    live.peerDown(9L) // no-op flush must not invalidate
    assert(live.table eq t2)
  }

  test("rebuilds coalesce under churn; lookups unchanged after the interval") {
    // manual clock: 1000 announcements with a busy reader calling table()
    // after EVERY update, clock advancing 10 ms per update, coalescing
    // interval 1 s → the 10 s span admits at most ~11 rebuilds instead
    // of 1000 (the O(table)-per-update cliff at full-table churn)
    var now = 0L
    val live = new Rib.Live(minRebuildMs = 1000L, clock = () => now)
    val strict = new Rib.Live // reference semantics: rebuild-on-change
    (0 until 1000).foreach { i =>
      val cidr = s"10.${i / 256}.${i % 256}.0/24"
      val r = Rib.Route(s"192.0.2.${i % 8}", 65000L + i % 8)
      live.announce(1L, cidr, r)
      strict.announce(1L, cidr, r)
      live.table // busy reader
      strict.table // same reader against rebuild-on-change
      now += 10
    }
    assert(live.rebuilds <= 12, s"rebuilds=${live.rebuilds}")
    assert(strict.rebuilds == 1000L) // the cliff this bounds
    // after the interval elapses the next read is fully fresh, and
    // tableNow flushes immediately regardless of the interval
    now += 1000
    val t = live.table
    (0 until 1000 by 97).foreach { i =>
      val got = t.lookup(Ip.parse(s"10.${i / 256}.${i % 256}.9"), null)
      val want = strict.table.lookup(Ip.parse(s"10.${i / 256}.${i % 256}.9"), null)
      assert(got.asn == want.asn &&
        got.nextHop.toSeq == want.nextHop.toSeq)
    }
    live.announce(2L, "172.16.0.0/16", Rib.Route("192.0.2.99", 65099))
    assert(live.tableNow.lookup(Ip.parse("172.16.1.1"), null).asn == 65099L)
  }

  test("attribute interning dedupes shared route attributes") {
    // 1000 prefixes sharing 2 attribute sets — build must not blow up and
    // lookups stay correct (the interning mirror of bmp/rib.go:92-154)
    val entries = (0 until 1000).map { i =>
      Rib.RouteEntry(s"10.${i / 256}.${i % 256}.0/24",
        Rib.Route(s"192.0.2.${i % 2}", 65000L + i % 2))
    }
    val t = Rib.Table.build(entries)
    assert(t.size == 1000)
    assert(t.lookup(Ip.parse("10.1.5.9"), null).asn == (65000L + (256 + 5) % 2))
  }
}
