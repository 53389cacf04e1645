package graft.sources

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import graft.decode.BmpDecoder
import graft.functions.Rib

/** TCP session endpoint for BMP (the reference's
  * `outlet/routing/provider/bmp/serve.go`): routers connect, stream
  * RFC 7854 messages, and every decoded event lands in the shared
  * [[Rib.Live]] — the running engine's RIB lookups pick up the next
  * [[Rib.Live.table]] snapshot (rebuild-on-change), exactly how the
  * reference keeps BGP attributes current under its flow queries.
  *
  * Per-connection read loop with PARTIAL-TAIL CARRY: TCP does not frame
  * messages, so each read appends to the connection's buffer,
  * [[BmpDecoder.messages]] consumes every complete message, and the
  * remainder waits for more bytes.
  *
  * STALE-PEER REMOVAL: peer identity is session-scoped, so a dropped
  * session's peers can never be referenced again — a reconnecting
  * router mints fresh ids and re-announces. Its old routes must
  * therefore be withdrawn by the server (the reference's stale-peer
  * removal after connection loss, `serve.go` / events.go `staleUntil`),
  * or they'd resolve forever and the RIB would grow without bound
  * across routine reconnects. `staleTimeoutMs` is the grace window:
  * 0 (default) peer-downs a dropped session's peers immediately; a
  * positive value keeps them resolvable for that long so a quick
  * reconnect + re-announce never leaves a lookup gap (the reference's
  * configurable stale timeout).
  *
  * Control-plane scale: BMP event rate is session-bound (routing
  * updates), orders of magnitude below the data plane; one thread per
  * router connection matches the reference's goroutine-per-connection
  * and never touches a Spark job — executors only ever see the
  * immutable broadcast table snapshots.
  */
final class BmpServer(live: Rib.Live, staleTimeoutMs: Long = 0L) {

  private val counters = new ConcurrentHashMap[String, AtomicLong]()
  // active per-connection sockets — stop() closes them so their read
  // loops exit instead of lingering as daemon threads feeding the RIB
  private val active =
    java.util.Collections.newSetFromMap(new ConcurrentHashMap[Socket, java.lang.Boolean]())
  // peer identity is scoped per SESSION (reference `peerKey`,
  // events.go:36-46): two routers of different exporters reusing the
  // same (AS, router-id) pair must not share RIB peer state. Each
  // (session, AS, router-id) triple interns to a dense unique Long —
  // the decoder treats it as opaque, so no bit-packing collision exists.
  private val sessionSeq = new AtomicLong()
  private val peerSeq = new AtomicLong()
  private val peerIds = new ConcurrentHashMap[(Long, Long, Long), Long]()
  private def sessionPeer(session: Long)(asn: Long, bgpId: Long): Long =
    peerIds.computeIfAbsent((session, asn, bgpId),
      _ => peerSeq.incrementAndGet())
  @volatile private var server: ServerSocket = _
  @volatile private var running = false
  // one shared timer fires delayed stale-peer removals; daemon so an
  // undisposed server never blocks JVM exit. Only exists when a grace
  // window is configured, and is RECREATED by each start() — stop()
  // shuts it down, and a supported stop()/start() cycle must not
  // silently degrade the grace window to immediate withdrawal.
  @volatile private var staleSweeper:
      Option[java.util.concurrent.ScheduledExecutorService] = None
  // pending stale flushes, tracked OURSELVES: a ScheduledFutureTask
  // returned by shutdownNow() refuses to run() once the pool is STOPped
  // (it consults executor state), so draining the executor's queue
  // would silently drop the withdrawals. Each wrapper removes itself
  // before flushing, so timer-fire and stop()-drain are exactly-once.
  private val pendingStale =
    java.util.Collections.newSetFromMap(new ConcurrentHashMap[Runnable, java.lang.Boolean]())

  private def bump(k: String, n: Long): Unit =
    counters.computeIfAbsent(k, _ => new AtomicLong).addAndGet(n)

  /** Per-cause event counters across all connections (the decode-plane
    * drop-counter discipline), plus `connections`.
    */
  def stats: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    counters.forEach((k, v) => b += k -> v.get())
    b.result()
  }

  /** Bind and serve on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = synchronized {
    require(server == null, "already started")
    if (staleTimeoutMs > 0L)
      staleSweeper = Some(
        java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
          (r: Runnable) => {
            val th = new Thread(r, "bmp-stale"); th.setDaemon(true); th
          }))
    server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", port))
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          bump("connections", 1)
          val t = new Thread(() => serve(sock), "bmp-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => () /* closed */ }
      }
    }, "bmp-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  private def serve(sock: Socket): Unit = {
    active.add(sock)
    val session = sessionSeq.incrementAndGet()
    val mkPeer = sessionPeer(session) _
    val in = sock.getInputStream
    var carry = Array.emptyByteArray
    val chunk = new Array[Byte](64 * 1024)
    try {
      var n = in.read(chunk)
      while (running && n >= 0) {
        if (n > 0) {
          val buf = new Array[Byte](carry.length + n)
          System.arraycopy(carry, 0, buf, 0, carry.length)
          System.arraycopy(chunk, 0, buf, carry.length, n)
          val (events, consumed) = BmpDecoder.messages(buf, mkPeer)
          BmpDecoder.feed(live, events).foreach { case (k, c) => bump(k, c) }
          carry = java.util.Arrays.copyOfRange(buf, consumed, buf.length)
        }
        n = in.read(chunk)
      }
    } catch { case _: java.io.IOException => () }
    finally {
      active.remove(sock); sock.close()
      // a closed session's mkPeer is unreachable, so its interned ids can
      // never be minted again — drop them (a week of router reconnects
      // must not grow the intern map without bound), then withdraw their
      // routes: immediately, or after the stale grace window during which
      // a reconnecting router's fresh announcements take over seamlessly.
      val mine = new java.util.ArrayList[Long]()
      peerIds.forEach { (k, v) => if (k._1 == session) mine.add(v) }
      peerIds.keySet.removeIf(_._1 == session)
      if (!mine.isEmpty) {
        val flush: Runnable = () => {
          mine.forEach { p => live.peerDown(p); () }
          bump("disconnect_flushed_peers", mine.size.toLong)
        }
        staleSweeper match {
          case None => flush.run()
          case Some(sweeper) =>
            bump("stale_scheduled_peers", mine.size.toLong)
            val wrapper: Runnable = new Runnable {
              override def run(): Unit =
                if (pendingStale.remove(this)) flush.run()
            }
            pendingStale.add(wrapper)
            try sweeper.schedule(wrapper, staleTimeoutMs,
              java.util.concurrent.TimeUnit.MILLISECONDS)
            catch {
              // stop() already shut the sweeper down: no reconnect is
              // coming, withdraw immediately
              case _: java.util.concurrent.RejectedExecutionException =>
                wrapper.run()
            }
        }
      }
    }
  }

  def stop(): Unit = synchronized {
    running = false
    if (server != null) { server.close(); server = null }
    // close active connections too: their read loops exit via the
    // IOException path instead of blocking in read() until the remote
    // router disconnects (a stop/start cycle must not leak feeders)
    active.forEach(s => try s.close() catch { case _: java.io.IOException => () })
    active.clear()
    // run any pending stale flushes now: a stopped server has no
    // reconnect to wait for, and the sweeper thread must not outlive us
    staleSweeper.foreach { sweeper => sweeper.shutdownNow(); () }
    staleSweeper = None
    pendingStale.forEach(_.run())
  }
}
