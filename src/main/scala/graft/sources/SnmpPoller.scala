package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress, SocketTimeoutException}
import graft.decode.SnmpCodec
import graft.decode.SnmpCodec._

/** SNMPv2c metadata poller — the wire half of J3 (reference
  * `outlet/metadata/provider/snmp/poller.go:118-296`): one GetRequest
  * per (exporter, ifIndex) for sysName + the four interface scalars,
  * and the reference's exact name/description resolution (many devices
  * put the name in ifDescr and the description in ifAlias; ifName wins,
  * ifAlias then ifDescr fill the description when they differ from it,
  * `poller.go:259-277`). Speed (ifHighSpeed, Mbps) and sysName are
  * mandatory; a missing ifName fails the poll like the reference
  * ("don't handle the other case").
  *
  * Control-plane scale: polls are per-exporter-interface with a
  * DEDICATED cache upstream ([[graft.streaming.Enrichment.MetadataDim]]
  * is the broadcast dimension the flows join; this poller only REFILLS
  * that dimension on miss/expiry, at SNMP rate, never inside a Spark
  * task).
  */
object SnmpPoller {

  final case class IfInfo(sysName: String, name: String,
      description: String, speedMbps: Long)

  val SysNameOid = "1.3.6.1.2.1.1.5.0"
  def ifDescrOid(i: Long): String = s"1.3.6.1.2.1.2.2.1.2.$i"
  def ifNameOid(i: Long): String = s"1.3.6.1.2.1.31.1.1.1.1.$i"
  def ifAliasOid(i: Long): String = s"1.3.6.1.2.1.31.1.1.1.18.$i"
  def ifSpeedOid(i: Long): String = s"1.3.6.1.2.1.31.1.1.1.15.$i"

  /** The 5-OID request order the reference sends (`poller.go:122-128`). */
  def oids(ifIndex: Long): Seq[String] = Seq(SysNameOid, ifDescrOid(ifIndex),
    ifNameOid(ifIndex), ifAliasOid(ifIndex), ifSpeedOid(ifIndex))

  /** Apply the reference's resolution rules to a response's varbinds
    * (positional, same order as [[oids]]). None = failed poll.
    */
  def resolve(binds: Seq[VarBind]): Option[IfInfo] = {
    def str(i: Int): Option[String] = binds.lift(i).map(_.value).collect {
      case StrVal(s) => s
    }
    def num(i: Int): Option[Long] = binds.lift(i).map(_.value).collect {
      case IntVal(v) => v
    }
    for {
      sysName <- str(0) if sysName.nonEmpty
      name <- str(2) // ifName is mandatory — reference bails without it
      speed <- num(4) // as is speed
    } yield {
      val descr = str(1)
      val alias = str(3)
      val description = alias.filter(_ != name)
        .orElse(descr.filter(_ != name))
        .getOrElse("")
      IfInfo(sysName, name, description, speed)
    }
  }

  /** One blocking poll round trip (UDP, `timeoutMs`); None on timeout,
    * SNMP error-status, mismatched request id, or failed resolution.
    */
  def poll(host: String, port: Int, community: String, ifIndex: Long,
      timeoutMs: Int = 1000, requestId: Long = 1L): Option[IfInfo] = {
    val sock = new DatagramSocket()
    try {
      sock.setSoTimeout(timeoutMs)
      val req = SnmpCodec.getRequest(community, requestId, oids(ifIndex))
      sock.send(new DatagramPacket(req, req.length,
        InetAddress.getByName(host), port))
      val buf = new Array[Byte](65535)
      val pkt = new DatagramPacket(buf, buf.length)
      sock.receive(pkt)
      val (_, pdu) = SnmpCodec.decode(
        java.util.Arrays.copyOfRange(buf, 0, pkt.getLength))
      if (pdu.requestId != requestId || pdu.errorStatus != 0) None
      else resolve(pdu.varBinds)
    } catch {
      case _: SocketTimeoutException => None
      case _: IllegalArgumentException => None // malformed response
    } finally sock.close()
  }
}
