package graft.sources

import java.net.Socket
import org.scalatest.funsuite.AnyFunSuite
import graft.decode.BmpFixtures._
import graft.functions.{Ip, Rib}

/** Socket-level BMP session: a "router" connects over loopback TCP,
  * streams messages (split mid-message to exercise the partial-tail
  * carry), and the shared live RIB resolves lookups — then a Peer Down
  * on the same session withdraws everything.
  */
class BmpServerSpec extends AnyFunSuite {

  private def awaitUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      if (cond) return true
      Thread.sleep(10)
    }
    cond
  }

  test("a live session announces, survives split writes, withdraws on peer down") {
    val live = new Rib.Live
    val srv = new BmpServer(live)
    val port = srv.start()
    try {
      val sock = new Socket("127.0.0.1", port)
      val out = sock.getOutputStream
      // split the announce mid-message: the carry must reassemble it
      val msg = announceMsg
      out.write(msg, 0, 20); out.flush()
      Thread.sleep(50)
      out.write(msg, 20, msg.length - 20); out.flush()

      assert(awaitUntil(5000) {
        live.table.lookup(Ip.parse("10.0.0.7"), null) != null
      }, s"announce never reached the RIB; stats=${srv.stats}")
      val r = live.table.lookup(Ip.parse("10.0.0.7"), null)
      assert(r.asn == 65002L && r.netMask == 24)

      out.write(peerDownMsg); out.flush()
      assert(awaitUntil(5000) {
        live.table.lookup(Ip.parse("10.0.0.7"), null) == null
      }, s"peer down never flushed; stats=${srv.stats}")

      sock.close()
      assert(srv.stats("announce") == 2)
      assert(srv.stats("peer_down") == 1)
      assert(srv.stats("connections") == 1)
    } finally srv.stop()
  }

  test("two concurrent sessions feed one RIB without interference") {
    val live = new Rib.Live
    val srv = new BmpServer(live)
    val port = srv.start()
    try {
      val s1 = new Socket("127.0.0.1", port)
      val s2 = new Socket("127.0.0.1", port)
      // peer B announces a disjoint prefix
      val peerB = bytes(bmp(0, peerHdr(65010, 22) ++
        bgpUpdate(Nil, attr(2, asPath4(65010L)) ++ attr(3, Seq(192, 0, 2, 7)),
          pfx4(172, 16, 0, 12))))
      s1.getOutputStream.write(announceMsg); s1.getOutputStream.flush()
      s2.getOutputStream.write(peerB); s2.getOutputStream.flush()
      assert(awaitUntil(5000) {
        live.table.lookup(Ip.parse("10.0.0.7"), null) != null &&
          live.table.lookup(Ip.parse("172.16.9.9"), null) != null
      }, s"stats=${srv.stats}")
      // peer A going down must not touch peer B's routes
      s1.getOutputStream.write(peerDownMsg); s1.getOutputStream.flush()
      assert(awaitUntil(5000) {
        live.table.lookup(Ip.parse("10.0.0.7"), null) == null
      })
      assert(live.table.lookup(Ip.parse("172.16.9.9"), null).asn == 65010L)
      s1.close(); s2.close()
    } finally srv.stop()
  }

  test("same (AS, router-id) on two sessions never cross-flushes") {
    // two routers of DIFFERENT exporters reusing the same (AS 65000,
    // router-id 10.0.0.1) — common with RFC 1918 router-ids. Peer
    // identity is session-scoped (reference peerKey, events.go:36-46):
    // session 1's Peer Down must not flush session 2's routes.
    val live = new Rib.Live
    val srv = new BmpServer(live)
    val port = srv.start()
    try {
      val s1 = new Socket("127.0.0.1", port)
      val s2 = new Socket("127.0.0.1", port)
      // session 2 announces a disjoint prefix from the SAME peer tuple
      val sameTupleB = bytes(bmp(0, peerHdr(65000, 0x0a000001L) ++
        bgpUpdate(Nil, attr(2, asPath4(65020L)) ++ attr(3, Seq(192, 0, 2, 9)),
          pfx4(172, 31, 0, 16))))
      s1.getOutputStream.write(announceMsg); s1.getOutputStream.flush()
      s2.getOutputStream.write(sameTupleB); s2.getOutputStream.flush()
      assert(awaitUntil(5000) {
        live.table.lookup(Ip.parse("10.0.0.7"), null) != null &&
          live.table.lookup(Ip.parse("172.31.5.5"), null) != null
      }, s"stats=${srv.stats}")
      s1.getOutputStream.write(peerDownMsg); s1.getOutputStream.flush()
      assert(awaitUntil(5000) {
        live.table.lookup(Ip.parse("10.0.0.7"), null) == null
      }, "session 1's routes never flushed")
      // session 2's route from the identical (AS, router-id) survives
      assert(live.table.lookup(Ip.parse("172.31.5.5"), null) != null,
        "peer-down cross-flushed the other session's identically-keyed peer")
      assert(live.table.lookup(Ip.parse("172.31.5.5"), null).asn == 65020L)
      s1.close(); s2.close()
    } finally srv.stop()
  }

  test("disconnect withdraws a dropped session's routes (default immediate)") {
    // peer ids are session-scoped: a reconnecting router mints fresh
    // ids, so the dropped session's routes can never be withdrawn by a
    // later Peer Down. The server must remove them itself — the
    // reference's stale-peer removal after connection loss.
    val flushRib = new Rib.Live
    val flush = new BmpServer(flushRib)
    val flushPort = flush.start()
    try {
      val s = new Socket("127.0.0.1", flushPort)
      s.getOutputStream.write(announceMsg); s.getOutputStream.flush()
      assert(awaitUntil(5000) {
        flushRib.table.lookup(Ip.parse("10.0.0.7"), null) != null
      })
      s.close()
      assert(awaitUntil(5000) {
        flushRib.table.lookup(Ip.parse("10.0.0.7"), null) == null
      }, s"disconnect never withdrew; stats=${flush.stats}")
      assert(flush.stats("disconnect_flushed_peers") == 1)
    } finally flush.stop()
  }

  test("stale grace window: quick reconnect re-announces before the flush lands") {
    // with a grace window the dropped session's routes stay resolvable;
    // a reconnect + re-announce takes over, and the deadline then
    // retires only the dead session's peer (no lookup gap, no growth)
    val rib = new Rib.Live
    val srv = new BmpServer(rib, staleTimeoutMs = 1500L)
    val port = srv.start()
    try {
      val s1 = new Socket("127.0.0.1", port)
      s1.getOutputStream.write(announceMsg); s1.getOutputStream.flush()
      assert(awaitUntil(5000) {
        rib.table.lookup(Ip.parse("10.0.0.7"), null) != null
      })
      s1.close()
      Thread.sleep(150) // inside the grace window
      assert(rib.table.lookup(Ip.parse("10.0.0.7"), null) != null,
        "grace window flushed early")
      // router reconnects and re-announces the same prefix
      val s2 = new Socket("127.0.0.1", port)
      s2.getOutputStream.write(announceMsg); s2.getOutputStream.flush()
      assert(awaitUntil(5000) { srv.stats.getOrElse("announce", 0L) >= 4 },
        s"re-announce never decoded; stats=${srv.stats}")
      // old session's peer goes down at the deadline; the re-announced
      // route from the live session keeps resolving throughout
      assert(awaitUntil(5000) {
        srv.stats.getOrElse("disconnect_flushed_peers", 0L) == 1
      }, s"stale deadline never fired; stats=${srv.stats}")
      assert(rib.table.lookup(Ip.parse("10.0.0.7"), null) != null,
        "stale flush withdrew the live session's re-announced route")
      assert(srv.stats("stale_scheduled_peers") == 1)
      s2.close()
    } finally srv.stop()
  }

  test("stale deadline withdraws when no reconnect happens") {
    val rib = new Rib.Live
    val srv = new BmpServer(rib, staleTimeoutMs = 200L)
    val port = srv.start()
    try {
      val s = new Socket("127.0.0.1", port)
      s.getOutputStream.write(announceMsg); s.getOutputStream.flush()
      assert(awaitUntil(5000) {
        rib.table.lookup(Ip.parse("10.0.0.7"), null) != null
      })
      s.close()
      assert(awaitUntil(5000) {
        rib.table.lookup(Ip.parse("10.0.0.7"), null) == null
      }, s"stale deadline never withdrew; stats=${srv.stats}")
    } finally srv.stop()
  }

  test("stop() drains pending stale flushes immediately") {
    // a long grace window, then stop() before the deadline: no reconnect
    // is coming to a stopped server, so the dropped session's routes
    // must withdraw NOW — not leak past the server's lifetime. (The
    // executor's own drained tasks refuse to run after shutdownNow; the
    // server tracks pending flushes itself.)
    val rib = new Rib.Live
    val srv = new BmpServer(rib, staleTimeoutMs = 60000L)
    val port = srv.start()
    val s = new Socket("127.0.0.1", port)
    s.getOutputStream.write(announceMsg); s.getOutputStream.flush()
    assert(awaitUntil(5000) {
      rib.table.lookup(Ip.parse("10.0.0.7"), null) != null
    })
    s.close()
    assert(awaitUntil(5000) {
      srv.stats.getOrElse("stale_scheduled_peers", 0L) == 1
    }, s"disconnect never scheduled; stats=${srv.stats}")
    srv.stop()
    assert(rib.table.lookup(Ip.parse("10.0.0.7"), null) == null,
      "stop() left a pending stale flush unexecuted")
    assert(srv.stats("disconnect_flushed_peers") == 1)
  }

  test("stop() closes active connections, not just the listener") {
    val live = new Rib.Live
    val srv = new BmpServer(live)
    val port = srv.start()
    val sock = new Socket("127.0.0.1", port)
    sock.getOutputStream.write(announceMsg); sock.getOutputStream.flush()
    assert(awaitUntil(5000) {
      live.table.lookup(Ip.parse("10.0.0.7"), null) != null
    })
    srv.stop()
    // the server-side close surfaces on our end: either a read EOF or a
    // write failure once the kernel processes the RST
    assert(awaitUntil(5000) {
      try {
        sock.getOutputStream.write(announceMsg)
        sock.getOutputStream.flush()
        false
      } catch { case _: java.io.IOException => true }
    }, "connection still writable after stop()")
    sock.close()
  }
}
