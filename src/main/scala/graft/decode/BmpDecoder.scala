package graft.decode

import graft.functions.Rib

/** BMP (BGP Monitoring Protocol, RFC 7854) wire decoder — the session
  * protocol the reference's routing provider speaks
  * (`outlet/routing/provider/bmp/events.go:36-49,229-440`) to keep its
  * RIB live. This closes the wire half of J4: [[Rib.Live]] already holds
  * the lifecycle semantics (announce / withdraw / peer-down flush);
  * [[BmpDecoder]] turns raw BMP bytes into those calls.
  *
  * Scope mirrors the reference's extraction, not a general BGP stack:
  * Route Monitoring BGP UPDATEs (v4 NLRI + withdrawals, MP_REACH /
  * MP_UNREACH for v6), the NEXT_HOP / AS_PATH / COMMUNITIES attributes,
  * origin-AS = last AS of the flattened path (peer AS when the path is
  * empty, `events.go:296-301`), Peer Up / Peer Down lifecycle, and
  * Initiation / Termination / Statistics framing. L3VPN RD filtering,
  * add-path, EVPN, and large/extended communities are consciously out —
  * they gate WHICH routes enter, not how the engine computes, and the
  * reference itself ignores NLRI families it does not track.
  *
  * TCP framing: BMP messages are length-prefixed; [[messages]] consumes
  * every complete message in the buffer and reports the bytes consumed,
  * so a session reader can carry partial tails between reads. Malformed
  * messages surface as [[Malformed]] events (per-cause counting upstream,
  * the decode plane's drop-counter discipline) without desynchronizing
  * the stream — the common-header length always advances the cursor.
  */
object BmpDecoder {

  sealed trait Event
  final case class PeerUp(peer: Long) extends Event
  final case class PeerDown(peer: Long) extends Event
  final case class Announce(peer: Long, cidr: String, route: Rib.Route)
      extends Event
  final case class Withdraw(peer: Long, cidr: String) extends Event
  final case class Stats(peer: Long) extends Event
  case object Initiation extends Event
  case object Termination extends Event
  final case class Malformed(reason: String) extends Event

  /** Default peer identity for [[Rib.Live]]: peer AS in the high 32
    * bits, peer BGP router id in the low 32. Sufficient for a SINGLE
    * session; the reference's `peerKey` (`events.go:36-46`) additionally
    * scopes by exporter, because two routers of different exporters may
    * legitimately reuse the same (AS, router-id) pair (RFC 1918
    * router-ids are common) and must never share RIB peer state — a
    * shared id would cross-flush one router's routes on the other's
    * Peer Down. Multi-session callers ([[graft.sources.BmpServer]]) pass
    * a session-scoped `mkPeer` to [[messages]] instead; the decoder
    * itself never derives semantics from the id (the origin-AS fallback
    * uses the header's AS field directly), so any collision-free Long
    * works.
    */
  def peerId(asn: Long, bgpId: Long): Long = (asn << 32) | bgpId

  /** Framing cap: no legitimate BMP message approaches 1 MB (a full
    * Internet-table UPDATE is ~4 KB); a forged length would otherwise
    * make the session buffer "wait for more bytes" forever.
    */
  val MaxMessageLen: Int = 1 << 20

  private val RouteMonitoring = 0
  private val Statistics = 1
  private val PeerDownMsg = 2
  private val PeerUpMsg = 3
  private val InitiationMsg = 4
  private val TerminationMsg = 5

  /** Decode every complete BMP message in `buf`; returns the events and
    * the number of bytes consumed (a partial trailing message stays).
    *
    * @param mkPeer peer-identity function (peer AS, BGP router id) →
    *               [[Rib.Live]] peer key; default is the single-session
    *               packing, session servers pass an exporter-scoped one
    */
  def messages(buf: Array[Byte],
      mkPeer: (Long, Long) => Long = peerId): (Seq[Event], Int) = {
    val out = Seq.newBuilder[Event]
    var pos = 0
    var done = false
    while (!done && buf.length - pos >= 6) {
      val w = new Wire(buf, pos, buf.length)
      val version = w.u8()
      val len = w.u32().toInt
      if (version != 3 || len < 6 || len > MaxMessageLen) {
        // cannot trust the framing — drop the rest of the buffer
        out += Malformed(s"bad header: version=$version len=$len")
        pos = buf.length
        done = true
      } else if (buf.length - pos < len) {
        done = true // partial tail, wait for more bytes
      } else {
        val msgType = w.u8()
        // copy the body: Wire's fixed-width reads bound only on the
        // ARRAY, so a truncated message parsed in place would silently
        // read into the next message instead of failing containment
        val body = java.util.Arrays.copyOfRange(buf, w.pos, pos + len)
        out ++= (try message(msgType, new Wire(body), mkPeer)
        catch {
          case _: ArrayIndexOutOfBoundsException =>
            Seq(Malformed(s"truncated body: type=$msgType"))
        })
        pos += len
      }
    }
    (out.result(), pos)
  }

  private def message(msgType: Int, w: Wire,
      mkPeer: (Long, Long) => Long): Seq[Event] = msgType match {
    case InitiationMsg => Seq(Initiation)
    case TerminationMsg => Seq(Termination)
    case RouteMonitoring =>
      val (peer, peerAs, asSize) = peerHeader(w, mkPeer)
      routeMonitoring(peer, peerAs, asSize, w)
    case Statistics => Seq(Stats(peerHeader(w, mkPeer)._1))
    case PeerDownMsg => Seq(PeerDown(peerHeader(w, mkPeer)._1))
    case PeerUpMsg => Seq(PeerUp(peerHeader(w, mkPeer)._1))
    case t => Seq(Malformed(s"unknown message type $t"))
  }

  /** Per-peer header (RFC 7854 §4.2, 42 bytes): returns the peer id,
    * the peer AS (for the empty-path origin fallback), and the AS_PATH
    * AS width (2 when the A flag marks a legacy 2-octet session, else 4).
    */
  private def peerHeader(w: Wire,
      mkPeer: (Long, Long) => Long): (Long, Long, Int) = {
    w.u8() // peer type
    val flags = w.u8()
    w.skip(8) // distinguisher
    w.skip(16) // peer address
    val asn = w.u32()
    val bgpId = w.u32()
    w.skip(8) // timestamps
    (mkPeer(asn, bgpId), asn, if ((flags & 0x20) != 0) 2 else 4)
  }

  /** Route Monitoring body: one BGP UPDATE message (with its 19-byte
    * BGP header).
    */
  private def routeMonitoring(peer: Long, peerAs: Long, asSize: Int,
      w: Wire): Seq[Event] = {
    w.skip(16) // BGP marker
    val bgpLen = w.u16()
    val bgpType = w.u8()
    if (bgpType != 2) return Seq.empty // not an UPDATE — ignore, like the reference
    if (bgpLen < 19) return Seq(Malformed("bad BGP length"))
    val out = Seq.newBuilder[Event]

    val withdrawn = w.slice(w.u16())
    val withdrawnV4 = prefixes(withdrawn, v6 = false)
    val attrs = w.slice(w.u16())

    // parseable default (an UPDATE carrying NLRI without NEXT_HOP is
    // wire-legal junk; the reference stores the zero address likewise)
    var nextHop: String = "0.0.0.0"
    var asPath: Seq[Long] = Nil
    var communities: Seq[Long] = Nil
    // (cidr, nextHop) of MP_REACH routes; MP_UNREACH withdrawals
    var mpReach: Seq[(String, String)] = Nil
    var mpUnreach: Seq[String] = Nil

    while (attrs.hasBytes(3)) {
      val flags = attrs.u8()
      val attrType = attrs.u8()
      val len = if ((flags & 0x10) != 0) attrs.u16() else attrs.u8()
      val body = attrs.slice(len)
      attrType match {
        case 2 => // AS_PATH: (segment type, count, count ASes)*, flattened
          val p = Seq.newBuilder[Long]
          while (body.hasBytes(2)) {
            body.u8() // segment type — flattened in order (asPathFlat)
            val n = body.u8()
            var i = 0
            while (i < n && body.hasBytes(asSize)) {
              p += (if (asSize == 2) body.u16().toLong else body.u32())
              i += 1
            }
          }
          asPath = p.result()
        case 3 => // NEXT_HOP (v4)
          if (len == 4) nextHop = renderAddr(body.take(4))
        case 8 => // COMMUNITIES: u32 each
          val c = Seq.newBuilder[Long]
          while (body.hasBytes(4)) c += body.u32()
          communities = c.result()
        case 14 => // MP_REACH_NLRI: afi u16, safi u8, nhlen u8, nh, 0, nlri
          val afi = body.u16()
          val safi = body.u8()
          val nhLen = body.u8()
          val nh = body.take(nhLen)
          body.skip(1) // reserved
          if (safi == 1 && (afi == 1 || afi == 2)) {
            val v6 = afi == 2
            // v6 next hop may carry global+link-local; the global is first
            val nhStr = renderAddr(nh.take(if (v6) 16 else 4))
            mpReach = prefixes(body, v6).map(c => (c, nhStr))
          }
        case 15 => // MP_UNREACH_NLRI: afi u16, safi u8, nlri
          val afi = body.u16()
          val safi = body.u8()
          if (safi == 1 && (afi == 1 || afi == 2))
            mpUnreach = prefixes(body, afi == 2)
        case _ => () // ORIGIN, MED, … — not collected (reference parity)
      }
    }

    // origin AS: last AS of the flattened path, peer AS when empty —
    // from the header field, never decoded back out of the opaque peer id
    val asn = asPath.lastOption.getOrElse(peerAs)
    def route(nh: String) = Rib.Route(nh, asn, asPath, communities)

    out ++= withdrawnV4.map(Withdraw(peer, _))
    val v4Nlri = prefixes(w, v6 = false) // rest of the UPDATE body
    out ++= v4Nlri.map(c => Announce(peer, c, route(nextHop)))
    out ++= mpReach.map { case (c, nh) => Announce(peer, c, route(nh)) }
    out ++= mpUnreach.map(Withdraw(peer, _))
    out.result()
  }

  /** NLRI prefix list: (plen u8, ceil(plen/8) bytes)*. */
  private def prefixes(w: Wire, v6: Boolean): Seq[String] = {
    val out = Seq.newBuilder[String]
    val max = if (v6) 128 else 32
    var ok = true
    while (ok && w.hasBytes(1)) {
      val plen = w.u8()
      val nBytes = (plen + 7) / 8
      if (plen > max || !w.hasBytes(nBytes)) ok = false
      else {
        val addr = new Array[Byte](if (v6) 16 else 4)
        Array.copy(w.take(nBytes), 0, addr, 0, nBytes)
        out += renderAddr(addr) + "/" + plen
      }
    }
    out.result()
  }

  private def renderAddr(b: Array[Byte]): String =
    java.net.InetAddress.getByAddress(b).getHostAddress

  /** Apply a decoded event stream to a live RIB (the reference's
    * provider loop): announce/withdraw mutate, peer-down flushes, and
    * the caller re-snapshots `live.table` per its refresh policy.
    * Returns per-cause event counts (the decode-plane counter
    * discipline).
    */
  def feed(live: Rib.Live, events: Seq[Event]): Map[String, Int] = {
    // apply strictly in wire order — an announce/withdraw pair for the
    // same prefix must land in sequence
    events.foreach {
      case Announce(p, c, r) => live.announce(p, c, r)
      case Withdraw(p, c) => live.withdraw(p, c)
      case PeerDown(p) => live.peerDown(p)
      case _ => ()
    }
    events.groupBy {
      case _: Announce => "announce"
      case _: Withdraw => "withdraw"
      case _: PeerUp => "peer_up"
      case _: PeerDown => "peer_down"
      case _: Stats => "stats"
      case Initiation | Termination => "session"
      case _: Malformed => "malformed"
    }.map { case (k, es) => k -> es.length }
  }
}
