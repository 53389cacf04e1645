package graft.functions

import org.apache.spark.sql.Column

/** BGP RIB lookup (SURVEY §2.4 J4; reference
  * `outlet/routing/provider/bmp/rib.go:451-492` + `bmp/lookup.go:24-50`):
  * a prefix can carry SEVERAL routes (one per BMP peer); a lookup walks the
  * longest matching prefix and selects the route whose next hop equals the
  * flow's next hop when one exists, else the first route — the "prefer the
  * exporter's own next hop" heuristic. Route attributes (ASN, AS path,
  * communities) are interned at build like the reference's `intern.Pool`
  * (`bmp/rib.go:92-154`): routes reference pool indexes, so a million
  * routes sharing a thousand distinct attribute sets cost a thousand
  * objects per executor.
  *
  * Scale shape: like [[Lpm]], the RIB is a broadcast-sized dimension that
  * ships once per executor inside the expression closure; the flow stream
  * never shuffles for routing enrichment.
  */
object Rib {

  /** One route announcement for a prefix. */
  final case class Route(nextHop: String, asn: Long,
      asPath: Seq[Long] = Nil, communities: Seq[Long] = Nil)

  final case class RouteEntry(cidr: String, route: Route)

  /** Selected-route view returned by [[Table.lookup]]; `netMask` is
    * v4-adjusted like `bmp/lookup.go:41-43`.
    */
  final case class Result(asn: Long, asPath: Array[Long],
      communities: Array[Long], netMask: Int, nextHop: Array[Byte])

  /** Immutable serializable route table: the [[Lpm]] sorted-interval LPM
    * layout, plus per-prefix route lists referencing interned next-hop and
    * attribute pools.
    */
  final class Table private[Rib] (
      los: Array[Array[Byte]],
      his: Array[Array[Byte]],
      parents: Array[Int],
      plens: Array[Int],
      routeNh: Array[Array[Int]],
      routeAttr: Array[Array[Int]],
      nhPool: Array[Array[Byte]],
      asnPool: Array[Long],
      asPathPool: Array[Array[Long]],
      commPool: Array[Array[Long]]) extends Serializable {

    def size: Int = los.length

    /** Most-specific prefix containing `addr`, then next-hop-preferring
      * route selection (`rib.go:472-483`): the first route wins unless a
      * route's next hop equals `preferredNh`.
      */
    def lookup(addr: Array[Byte], preferredNh: Array[Byte]): Result = {
      if (addr == null || los.length == 0) return null
      var left = 0
      var right = los.length - 1
      var candidate = -1
      while (left <= right) {
        val mid = (left + right) >>> 1
        if (Table.le(los(mid), addr)) { candidate = mid; left = mid + 1 }
        else right = mid - 1
      }
      var i = candidate
      while (i >= 0) {
        if (Table.le(addr, his(i))) {
          val nhs = routeNh(i)
          if (nhs.length == 0) return null
          var sel = 0
          if (preferredNh != null) {
            var r = 0
            var found = false
            while (r < nhs.length && !found) {
              if (java.util.Arrays.equals(nhPool(nhs(r)), preferredNh)) {
                sel = r; found = true
              }
              r += 1
            }
          }
          val a = routeAttr(i)(sel)
          val mask =
            if (Ip.isV4Mapped(addr)) plens(i) - 96
            else plens(i)
          return Result(asnPool(a), asPathPool(a), commPool(a), mask,
            nhPool(nhs(sel)))
        }
        i = parents(i)
      }
      null
    }
  }

  object Table {
    private[Rib] def le(a: Array[Byte], b: Array[Byte]): Boolean = {
      var i = 0
      while (i < 16) {
        val x = a(i) & 0xff
        val y = b(i) & 0xff
        if (x != y) return x < y
        i += 1
      }
      true
    }

    private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < 16) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      0
    }

    /** Build with attribute/next-hop interning. Routes of the same prefix
      * keep insertion order — the reference iterates peers in storage
      * order and the first route is the fallback selection.
      */
    def build(entries: Seq[RouteEntry]): Table = {
      val nhIndex = scala.collection.mutable.LinkedHashMap.empty[Seq[Byte], Int]
      val attrIndex = scala.collection.mutable.LinkedHashMap.empty[(Long, Seq[Long], Seq[Long]), Int]
      def internNh(s: String): Int = {
        val b = Ip.parse(s).toSeq
        nhIndex.getOrElseUpdate(b, nhIndex.size)
      }
      def internAttr(r: Route): Int =
        attrIndex.getOrElseUpdate((r.asn, r.asPath, r.communities), attrIndex.size)

      val grouped = entries
        .map { e =>
          val (lo, hi) = Ip.cidrRange(e.cidr)
          val isV4 = e.cidr.takeWhile(_ != '/').contains('.')
          val b = e.cidr.dropWhile(_ != '/').drop(1).toInt + (if (isV4) 96 else 0)
          (lo, hi, b, internNh(e.route.nextHop), internAttr(e.route))
        }
        .groupBy(t => (t._1.toSeq, t._3))
        .map { case (_, group) =>
          val (lo, hi, b, _, _) = group.head
          (lo, hi, b, group.map(_._4).toArray, group.map(_._5).toArray)
        }
        .toArray
        .sortWith { (x, y) =>
          val c = cmp(x._1, y._1)
          if (c != 0) c < 0 else x._3 < y._3
        }

      // nesting sweep (same invariant as Lpm.Table.build): parent = the
      // tightest enclosing entry; no attribute inheritance here — a RIB
      // route either exists for a prefix or the parent's own routes apply
      val parents = new Array[Int](grouped.length)
      val stack = scala.collection.mutable.Stack[Int]()
      grouped.indices.foreach { i =>
        val (lo, hi, _, _, _) = grouped(i)
        while (stack.nonEmpty && !(le(grouped(stack.top)._1, lo) &&
          le(hi, grouped(stack.top)._2))) stack.pop()
        parents(i) = if (stack.isEmpty) -1 else stack.top
        stack.push(i)
      }

      new Table(
        grouped.map(_._1), grouped.map(_._2), parents,
        grouped.map(_._3), grouped.map(_._4), grouped.map(_._5),
        nhIndex.keys.map(_.toArray).toArray,
        attrIndex.keys.map(_._1).toArray,
        attrIndex.keys.map(_._2.toArray).toArray,
        attrIndex.keys.map(_._3.toArray).toArray)
    }
  }

  /** Column resolving (addr, preferredNextHop) to one field of the
    * selected route: "asn" (long), "aspath"/"communities" (array<long>),
    * "netmask" (int), "nexthop" (16-byte binary). Null on miss.
    */
  def lookup(table: Table, field: String)(addrCol: Column, nhCol: Column): Column =
    graft.expressions.RibLookup(addrCol, nhCol, table, field)

  /** Dynamic RIB lifecycle over the immutable lookup [[Table]] — the BMP
    * session semantics (reference `outlet/routing/provider/bmp/rib.go`
    * AddRoute :315 / RemoveRoute :370 / FlushPeer :406, driven by
    * `events.go:100-146` removePeer + handlePeerDownNotification):
    *
    *  - `announce`: a peer re-announcing a prefix UPDATES its route in
    *    place — position in the route list is preserved, so the fallback
    *    ("first route wins") selection is stable across re-announcements,
    *    exactly like the reference's keyed update (`rib.go:356-363`).
    *  - `withdraw`: removes that peer's route; a prefix whose route list
    *    empties leaves the tree entirely (`rib.go:391-396`), so lookups
    *    fall through to the covering prefix.
    *  - `peerDown`: flushes every route of the peer in one sweep and
    *    reports (routesRemoved, prefixesRemoved) — the `FlushPeer`
    *    contract the reference feeds its metrics from.
    *
    * One route per (peer, prefix): the non-add-path BMP shape (the
    * reference distinguishes add-path routes by NLRI path id; datagram
    * feeds without add-path collapse to this).
    *
    * Concurrency/scale shape: mutations are driver-side control-plane
    * events (BMP session rate, not flow rate); [[table]] republishes an
    * immutable broadcast-safe snapshot only when the route set actually
    * changed — [[Lpm.RefreshingTable]]'s rebuild-on-change, applied to
    * announce/withdraw streams.
    *
    * At full-table scale (~1M prefixes) under continuous BMP churn,
    * EVERY dirty [[table]] call would pay an O(table) rebuild — with a
    * busy reader that degenerates to a rebuild per update batch. So
    * rebuilds COALESCE on `minRebuildMs`: a dirty read inside the
    * interval serves the previous snapshot (bounded, deliberate
    * staleness — the reference's flow plane likewise reads its RIB copy
    * asynchronously from BMP churn), and the rebuild cost is bounded by
    * `span / minRebuildMs` instead of by the update rate. The default 0
    * keeps strict rebuild-on-change for lookup-after-update callers.
    *
    * @param minRebuildMs minimum interval between snapshot rebuilds
    * @param clock millisecond clock (injectable for tests)
    */
  final class Live(minRebuildMs: Long = 0L,
      clock: () => Long = () => System.currentTimeMillis()) {
    private val prefixes =
      scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Route)]]
    private var dirty = true
    private var snapshot: Table = Table.build(Nil)
    private var lastRebuildAt = -1L
    private var rebuildCount = 0L

    /** Number of snapshot rebuilds so far (the churn-cost meter). */
    def rebuilds: Long = synchronized { rebuildCount }

    /** Route announcement; true when a new route slot was created (false =
      * in-place update of this peer's existing route for the prefix).
      */
    def announce(peer: Long, cidr: String, route: Route): Boolean = synchronized {
      val rs = prefixes.getOrElseUpdate(cidr,
        scala.collection.mutable.ArrayBuffer.empty)
      dirty = true
      val i = rs.indexWhere(_._1 == peer)
      if (i >= 0) { rs(i) = (peer, route); false }
      else { rs += ((peer, route)); true }
    }

    /** Route withdrawal; true when this peer actually had a route for the
      * prefix. An emptied prefix disappears from the lookup tree.
      */
    def withdraw(peer: Long, cidr: String): Boolean = synchronized {
      prefixes.get(cidr) match {
        case None => false
        case Some(rs) =>
          val i = rs.indexWhere(_._1 == peer)
          if (i < 0) false
          else {
            rs.remove(i)
            dirty = true
            if (rs.isEmpty) prefixes.remove(cidr)
            true
          }
      }
    }

    /** Peer-down flush: every route of `peer` goes; returns
      * (routesRemoved, prefixesRemoved).
      */
    def peerDown(peer: Long): (Int, Int) = synchronized {
      var routes = 0
      val emptied = scala.collection.mutable.ArrayBuffer.empty[String]
      prefixes.foreach { case (cidr, rs) =>
        val before = rs.length
        rs.filterInPlace(_._1 != peer)
        routes += before - rs.length
        if (rs.isEmpty) emptied += cidr
      }
      emptied.foreach(prefixes.remove)
      if (routes > 0) dirty = true
      (routes, emptied.length)
    }

    /** Immutable snapshot for lookups/broadcast; rebuilt only when the
      * route set changed since the last call AND the coalescing interval
      * has elapsed (a dirty read inside the interval serves the previous
      * snapshot — see the class note on churn cost).
      */
    def table: Table = synchronized {
      if (dirty &&
          (lastRebuildAt < 0 || clock() - lastRebuildAt >= minRebuildMs))
        rebuild()
      snapshot
    }

    /** Current snapshot regardless of the coalescing interval — the
      * "flush before broadcast" path when a caller needs every applied
      * update visible right now.
      */
    def tableNow: Table = synchronized {
      if (dirty) rebuild()
      snapshot
    }

    private def rebuild(): Unit = {
      snapshot = Table.build(prefixes.iterator.flatMap { case (cidr, rs) =>
        rs.map { case (_, r) => RouteEntry(cidr, r) }
      }.toSeq)
      dirty = false
      lastRebuildAt = clock()
      rebuildCount += 1
    }
  }
}
