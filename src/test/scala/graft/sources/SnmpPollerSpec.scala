package graft.sources

import java.net.{DatagramPacket, DatagramSocket}
import org.scalatest.funsuite.AnyFunSuite
import graft.decode.SnmpCodec
import graft.decode.SnmpCodec._
import graft.sources.SnmpPoller._

/** SNMPv2c over real loopback UDP: a stub "agent" decodes the poller's
  * GetRequest with the same codec (round-trip proof) and answers; the
  * poller must apply the reference's resolution rules bit-for-bit.
  */
class SnmpPollerSpec extends AnyFunSuite {

  /** One-shot agent: decodes the next request, answers via `answer`. */
  private def withAgent(answer: Pdu => Seq[VarBind])(body: Int => Unit): Unit = {
    val sock = new DatagramSocket(0,
      java.net.InetAddress.getByName("127.0.0.1"))
    val t = new Thread(() => {
      try {
        val buf = new Array[Byte](65535)
        val pkt = new DatagramPacket(buf, buf.length)
        sock.receive(pkt)
        val (community, pdu) =
          SnmpCodec.decode(java.util.Arrays.copyOfRange(buf, 0, pkt.getLength))
        val resp = SnmpCodec.getResponse(community, pdu.requestId, 0, answer(pdu))
        sock.send(new DatagramPacket(resp, resp.length,
          pkt.getAddress, pkt.getPort))
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    try body(sock.getLocalPort) finally sock.close()
  }

  private def fullAnswer(pdu: Pdu): Seq[VarBind] = {
    // echo the requested OIDs back positionally, as a real agent does
    assert(pdu.varBinds.map(_.oid) == oids(7))
    Seq(
      VarBind(SysNameOid, StrVal("core-router-1")),
      VarBind(ifDescrOid(7), StrVal("TenGigE0/0/0/7")),
      VarBind(ifNameOid(7), StrVal("Te0/0/0/7")),
      VarBind(ifAliasOid(7), StrVal("transit: upstream-a")),
      VarBind(ifSpeedOid(7), IntVal(10000L)))
  }

  test("a poll round-trips over UDP and resolves the reference way") {
    withAgent(fullAnswer) { port =>
      val got = poll("127.0.0.1", port, "public", ifIndex = 7, requestId = 42L)
      assert(got.contains(IfInfo("core-router-1", "Te0/0/0/7",
        "transit: upstream-a", 10000L)))
    }
  }

  test("ifAlias equal to ifName falls back to ifDescr for the description") {
    val binds = Seq(
      VarBind(SysNameOid, StrVal("r1")),
      VarBind(ifDescrOid(1), StrVal("GigabitEthernet1")),
      VarBind(ifNameOid(1), StrVal("Gi1")),
      VarBind(ifAliasOid(1), StrVal("Gi1")), // same as name — skipped
      VarBind(ifSpeedOid(1), IntVal(1000L)))
    assert(resolve(binds).contains(IfInfo("r1", "Gi1", "GigabitEthernet1", 1000L)))
  }

  test("missing ifName or speed fails the poll like the reference") {
    val noName = Seq(
      VarBind(SysNameOid, StrVal("r1")),
      VarBind(ifDescrOid(1), StrVal("eth0")),
      VarBind(ifNameOid(1), NoSuch(0x81)),
      VarBind(ifAliasOid(1), StrVal("desc")),
      VarBind(ifSpeedOid(1), IntVal(1000L)))
    assert(resolve(noName).isEmpty)
    val noSpeed = fullAnswerStatic.updated(4, VarBind(ifSpeedOid(7), NoSuch(0x80)))
    assert(resolve(noSpeed).isEmpty)
    // empty sysName is an error (`poller.go:244-247`)
    assert(resolve(fullAnswerStatic.updated(0,
      VarBind(SysNameOid, StrVal("")))).isEmpty)
  }

  private val fullAnswerStatic = Seq(
    VarBind(SysNameOid, StrVal("core-router-1")),
    VarBind(ifDescrOid(7), StrVal("TenGigE0/0/0/7")),
    VarBind(ifNameOid(7), StrVal("Te0/0/0/7")),
    VarBind(ifAliasOid(7), StrVal("transit: upstream-a")),
    VarBind(ifSpeedOid(7), IntVal(10000L)))

  test("timeout returns None instead of hanging") {
    val dead = new DatagramSocket(0,
      java.net.InetAddress.getByName("127.0.0.1")) // never answers
    try assert(poll("127.0.0.1", dead.getLocalPort, "public", 1,
      timeoutMs = 200).isEmpty)
    finally dead.close()
  }

  test("a response with the wrong request id or an error status is rejected") {
    // agent answers with a shifted request id → poller must return None
    val sock = new DatagramSocket(0,
      java.net.InetAddress.getByName("127.0.0.1"))
    val t = new Thread(() => {
      try {
        val buf = new Array[Byte](65535)
        val pkt = new DatagramPacket(buf, buf.length)
        sock.receive(pkt)
        val (community, pdu) =
          SnmpCodec.decode(java.util.Arrays.copyOfRange(buf, 0, pkt.getLength))
        val resp = SnmpCodec.getResponse(community, pdu.requestId + 1, 0,
          fullAnswerStatic)
        sock.send(new DatagramPacket(resp, resp.length,
          pkt.getAddress, pkt.getPort))
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    try assert(poll("127.0.0.1", sock.getLocalPort, "public", 7,
      timeoutMs = 2000, requestId = 5L).isEmpty)
    finally sock.close()
    // and an SNMP error-status response is rejected at the codec level
    val err = SnmpCodec.getResponse("public", 5L, 2, fullAnswerStatic)
    assert(SnmpCodec.decode(err)._2.errorStatus == 2)
  }

  test("OID encode/decode round-trips multi-byte arcs") {
    for (oid <- Seq("1.3.6.1.2.1.31.1.1.1.18.4242", "1.3.6.1.4.1.9.9.999.1",
        "2.25.123456789")) {
      val enc = SnmpCodec.oidBytes(oid)
      val req = SnmpCodec.getRequest("c", 1L, Seq(oid))
      val (_, pdu) = SnmpCodec.decode(req)
      assert(pdu.varBinds.head.oid == oid, s"round-trip broke for $oid (${enc.length} bytes)")
    }
  }
}
