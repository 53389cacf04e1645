package graft.decode

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Ip

/** Second tranche of golden decoder tests ported from the reference suite:
  * ICMP type/code paths, RFC 7133 data-link frame sections, MPLS label
  * stacks, NAT columns, physical interfaces, the Juniper CPID drop PEN,
  * EVPN (Ethernet over MPLS with control word), and the sFlow record/
  * interface-format variants incl. VXLAN decapsulation
  * (`outlet/flow/decoder/netflow/root_test.go:423-1217`,
  * `sflow/root_test.go:196-664`).
  */
class DecoderExtendedSpec extends AnyFunSuite {

  private def pcap(name: String): Array[Byte] =
    Pcap.l4(Pcap.readResource(s"/graft/pcap/$name.pcap"))

  private val localhost = Ip.parse("127.0.0.1")
  private def ip(s: String): Array[Byte] = Ip.parse(s)

  private def run(names: Seq[String],
      options: DecodeOptions = DecodeOptions(DecodeOptions.TsInput),
      decap: PacketParse.Decap = PacketParse.DecapNone): Seq[DecodedFlow] = {
    var state = TemplateState.empty
    val out = Seq.newBuilder[DecodedFlow]
    names.foreach { n =>
      val r = NetflowDecoder.decode(pcap(n), localhost, 0L,
        options.copy(decap = decap), state)
      assert(r.error.isEmpty, s"$n: ${r.error}")
      state = r.state
      out ++= r.flows
    }
    out.result().map(_.copy(TimeReceived = 0L))
  }

  private def sflow(name: String,
      decap: PacketParse.Decap = PacketParse.DecapNone): Seq[DecodedFlow] = {
    val r = SflowDecoder.decode(pcap(name), 0L, DecodeOptions(decap = decap))
    assert(r.error.isEmpty, s"$name: ${r.error}")
    r.flows
  }

  private def baseline = DecodedFlow(
    TimeReceived = 0L, SamplingRate = 0L, ExporterAddress = localhost,
    InIf = 0, OutIf = 0, SrcAddr = null, DstAddr = null, NextHop = null,
    SrcNetMask = 0, DstNetMask = 0, SrcAS = 0, DstAS = 0, SrcVlan = 0,
    DstVlan = 0, Bytes = 0, Packets = 0, EType = 0, Proto = 0, SrcPort = 0,
    DstPort = 0, ForwardingStatus = 0, FlowDirection = 0, TCPFlags = 0,
    IPTos = 0, IPTTL = 0, IPFragmentID = 0, IPFragmentOffset = 0,
    IPv6FlowLabel = 0, ICMPv4Type = 0, ICMPv4Code = 0, ICMPv6Type = 0,
    ICMPv6Code = 0, SrcMAC = 0, DstMAC = 0, MPLSLabels = Nil, DstASPath = Nil,
    DstCommunities = Nil, SrcAddrNAT = null, DstAddrNAT = null,
    SrcPortNAT = 0, DstPortNAT = 0, IngressVRFID = 0, EgressVRFID = 0)

  private def assertFlows(got: Seq[DecodedFlow], want: Seq[DecodedFlow]): Unit = {
    assert(got.length == want.length,
      s"flow count ${got.length} != ${want.length}")
    def render(f: DecodedFlow): String = f.copy(
      ExporterAddress = null, SrcAddr = null, DstAddr = null, NextHop = null,
      SrcAddrNAT = null, DstAddrNAT = null).toString +
      Seq(f.ExporterAddress, f.SrcAddr, f.DstAddr, f.NextHop, f.SrcAddrNAT,
        f.DstAddrNAT).map(b => if (b == null) "-" else Ip.render(b)).mkString("|")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(render(g) == render(w), s"flow $i")
    }
  }

  // root_test.go:423-504 — ICMP type/code: explicit fields absent, the
  // Cisco dst-port encoding applies only when srcPort == 0
  test("netflow: ICMP type/code heuristics") {
    val got = run(Seq("icmp-template", "icmp-data"))
    assertFlows(got, Seq(
      baseline.copy(SrcAddr = ip("2001:db8::"), DstAddr = ip("2001:db8::1"),
        Bytes = 104, DstPort = 32768, EType = 34525, ICMPv6Type = 128,
        Packets = 1, Proto = 58, FlowDirection = 1),
      baseline.copy(SrcAddr = ip("2001:db8::1"), DstAddr = ip("2001:db8::"),
        Bytes = 104, DstPort = 33024, EType = 34525, ICMPv6Type = 129,
        Packets = 1, Proto = 58, FlowDirection = 1),
      baseline.copy(SrcAddr = ip("203.0.113.4"), DstAddr = ip("203.0.113.5"),
        Bytes = 84, DstPort = 2048, EType = 2048, ICMPv4Type = 8,
        Packets = 1, Proto = 1, FlowDirection = 1),
      baseline.copy(SrcAddr = ip("203.0.113.5"), DstAddr = ip("203.0.113.4"),
        Bytes = 84, EType = 2048, Packets = 1, Proto = 1, FlowDirection = 1)))
  }

  // root_test.go:505-553 — RFC 7133: L2/L3/L4 all from the raw frame
  test("netflow: dataLinkFrameSection dissection") {
    val got = run(Seq("datalink-template", "datalink-data"))
    assertFlows(got, Seq(baseline.copy(
      SrcAddr = ip("51.51.51.51"), DstAddr = ip("52.52.52.52"),
      SrcVlan = 231, DstVlan = 231, InIf = 582,
      Bytes = 96, SrcPort = 55501, DstPort = 11777, EType = 2048,
      Packets = 1, Proto = 17, SrcMAC = 0xb402165592f4L,
      DstMAC = 0x182ad36e503fL, IPFragmentID = 0x8f00, IPTTL = 119,
      FlowDirection = 1)))
  }

  // root_test.go:572-632 — IPFIX MPLS label stack sections
  test("netflow: MPLS label stack") {
    val got = run(Seq("mpls"))
    val t = baseline.copy(
      SrcAddr = ip("fd00::1:0:1:7:1"), NextHop = ip("0.0.0.0"),
      SamplingRate = 10, EType = 34525, ForwardingStatus = 66, IPTTL = 255,
      Proto = 17, SrcPort = 49153, DstPort = 862, FlowDirection = 2,
      EgressVRFID = 1)
    assertFlows(got, Seq(
      t.copy(DstAddr = ip("fd00::1:0:1:5:1"), OutIf = 16, Bytes = 89,
        Packets = 1, MPLSLabels = Seq(20005L, 524250L)),
      t.copy(DstAddr = ip("fd00::1:0:1:6:1"), OutIf = 17, Bytes = 890,
        Packets = 10, MPLSLabels = Seq(20006L, 524275L))))
  }

  // root_test.go:759-795 — NAT event: post-NAT addresses and ports
  test("netflow: NAT columns") {
    val got = run(Seq("nat"))
    assertFlows(got.take(1), Seq(baseline.copy(
      SrcAddr = ip("172.16.100.198"), DstAddr = ip("10.89.87.1"),
      SrcPort = 35303, DstPort = 53,
      SrcAddrNAT = ip("10.143.52.29"), DstAddrNAT = ip("10.89.87.1"),
      SrcPortNAT = 35303, DstPortNAT = 53,
      EType = 2048, Proto = 17)))
  }

  // root_test.go:796-838 — ingressPhysicalInterface fills InIf only when
  // the logical ingressInterface is absent/zero
  test("netflow: physical interfaces") {
    val got = run(Seq("physicalinterfaces"))
    assertFlows(got.take(1), Seq(baseline.copy(
      SamplingRate = 1000, InIf = 1342177291, SrcVlan = 4,
      SrcAddr = ip("147.53.240.75"), DstAddr = ip("212.82.101.24"),
      NextHop = ip("::"),
      SrcMAC = 0xc014fef6c365L, DstMAC = 0xe8b6c24ae34cL,
      Packets = 3, Bytes = 4506, SrcPort = 55629, DstPort = 993,
      TCPFlags = 0x10, EType = 2048, Proto = 6, IngressVRFID = 311)))
  }

  // root_test.go:1116-1160 — Juniper PEN commonPropertiesId: a non-zero
  // forwarding exception code marks the flow dropped (status 128)
  test("netflow: Juniper CPID drop") {
    val got = run(Seq("juniper-cpid-template", "juniper-cpid-data"))
    assertFlows(got, Seq(baseline.copy(
      InIf = 737, SrcAddr = ip("fc30:2200:1b::f"),
      DstAddr = ip("fc30:2200:23:e009::"),
      Packets = 1, Bytes = 104, FlowDirection = 1, ForwardingStatus = 128,
      EType = 34525, Proto = 4, IPTTL = 254, IPv6FlowLabel = 152740,
      SrcMAC = 0x0c00c386af07L, DstMAC = 0x2c6bf5e81fc5L)))
  }

  // root_test.go:1162-1216 — EVPN: Ethernet over MPLS with control word;
  // the frame recursion surfaces the inner packet
  test("netflow: ethernet over MPLS with control word") {
    val got = run(Seq("ethernet-over-mpls-with-control-word-template",
      "ethernet-over-mpls-with-control-word-data"))
    assert(got.length == 10)
    assertFlows(Seq(got(3)), Seq(baseline.copy(
      InIf = 1022, SrcAddr = ip("198.51.100.1"), DstAddr = ip("198.51.100.2"),
      EType = 2048, Proto = 6, SrcPort = 443, DstPort = 55427,
      TCPFlags = 16, IPTTL = 62, IPTos = 32, IPFragmentID = 41037,
      Bytes = 1492, Packets = 1, MPLSLabels = Seq(300012L, 17L),
      DstMAC = 0x020000000003L, SrcMAC = 0x020000000004L,
      FlowDirection = 1)))
  }

  // root_test.go:258-282 — a combined PDU carrying data AND templates:
  // both templates register (obs domain 17170432, ids 256/257) even
  // though the data set precedes them in the packet
  test("netflow: templates mixed with data in one datagram") {
    val r = NetflowDecoder.decode(pcap("data+templates"), localhost, 0L,
      DecodeOptions(DecodeOptions.TsInput), TemplateState.empty)
    assert(r.error.isEmpty)
    assert(r.state.template(9, 17170432L, 256).exists(_.kind == "options_template"))
    assert(r.state.template(9, 17170432L, 257).exists(_.kind == "template"))
    assert(r.state.templatesSeen == 2)
  }

  // root_test.go:1064-1114 — SRv6 decapsulation of the IPFIX 315 frame:
  // IP-in-IPv6 with SRH headers, inner packet surfaces, zero drops
  test("netflow: SRv6 decapsulation") {
    var state = TemplateState.empty
    var dropped = 0L
    val out = Seq.newBuilder[DecodedFlow]
    Seq("ipfix-srv6-template", "ipfix-srv6-data").foreach { n =>
      val r = NetflowDecoder.decode(pcap(n), localhost, 0L,
        DecodeOptions(DecodeOptions.TsInput, PacketParse.DecapSrv6), state)
      assert(r.error.isEmpty)
      state = r.state
      dropped += r.nonEncapDrops
      out ++= r.flows
    }
    assert(dropped == 0L)
    assertFlows(out.result().map(_.copy(TimeReceived = 0L)), Seq(baseline.copy(
      SrcAddr = ip("8.8.8.8"), DstAddr = ip("213.36.140.100"),
      Packets = 1, Bytes = 64, FlowDirection = 1, EType = 2048, Proto = 1,
      IPTTL = 63, IPFragmentID = 0xc96b)))
  }

  // root_test.go:978-1062 — under a decap option, non-encapsulated packets
  // yield no flows and count as "non-encapsulated packet" drops
  test("netflow: non-encapsulated packets drop with the golden counts") {
    val cases = Seq(
      (Seq("options-template", "options-data", "template", "data"), 4L),
      (Seq("mpls"), 2L),
      (Seq("physicalinterfaces"), 8L),
      (Seq("icmp-template", "icmp-data"), 4L),
      (Seq("multiplesamplingrates-options-template",
        "multiplesamplingrates-options-data", "multiplesamplingrates-template",
        "multiplesamplingrates-data"), 12L),
      (Seq("ipfixprobe-templates", "ipfixprobe-data"), 6L),
      (Seq("nat"), 9L),
      (Seq("nfv5"), 1L))
    cases.foreach { case (names, wantDrops) =>
      var state = TemplateState.empty
      var flows = 0
      var dropped = 0L
      names.foreach { n =>
        val r = NetflowDecoder.decode(pcap(n), localhost, 0L,
          DecodeOptions(DecodeOptions.TsInput, PacketParse.DecapVxlan), state)
        assert(r.error.isEmpty, n)
        state = r.state
        flows += r.flows.length
        dropped += r.nonEncapDrops
      }
      assert(flows == 0, s"$names produced flows under decap")
      assert(dropped == wantDrops, s"$names: drops $dropped != $wantDrops")
    }
  }

  // ---- sFlow variants (sflow/root_test.go:196-664) -------------------------

  private val agent = ip("172.16.0.3")
  private def v6flow = baseline.copy(
    ExporterAddress = agent, SamplingRate = 1024, InIf = 27,
    SrcVlan = 100, DstVlan = 100,
    SrcAddr = ip("2a0c:8880:2:0:185:21:130:38"),
    DstAddr = ip("2a0c:8880:2:0:185:21:130:39"),
    Bytes = 1500, Packets = 1, EType = 34525, Proto = 6, SrcPort = 46026,
    DstPort = 22, SrcMAC = 40057391053392L, DstMAC = 40057381862408L,
    IPTTL = 64, IPTos = 8, IPv6FlowLabel = 426132, TCPFlags = 0x10)

  test("sflow: local interface translates to 0") {
    assertFlows(sflow("sflow-local-interface"), Seq(v6flow.copy(OutIf = 0)))
  }

  test("sflow: discard interface maps the drop reason to forwarding status") {
    assertFlows(sflow("sflow-discard-interface"),
      Seq(v6flow.copy(OutIf = 0, ForwardingStatus = 131)))
  }

  test("sflow: multiple-output format leaves OutIf 0") {
    assertFlows(sflow("sflow-multiple-interfaces"), Seq(v6flow.copy(OutIf = 0)))
  }

  test("sflow: expanded flow sample") {
    assertFlows(sflow("sflow-sflow-expanded-sample"), Seq(baseline.copy(
      ExporterAddress = ip("49.49.49.49"), SamplingRate = 1000,
      InIf = 29001, OutIf = 1285816721,
      SrcAddr = ip("52.52.52.52"), DstAddr = ip("53.53.53.53"),
      NextHop = ip("54.54.54.54"), SrcAS = 203476, DstAS = 203361,
      SrcVlan = 809, DstVlan = 809, SrcNetMask = 32, DstNetMask = 22,
      Bytes = 104, Packets = 1, EType = 2048, Proto = 6, SrcPort = 22,
      DstPort = 52237,
      DstASPath = Seq(8218L, 29605L, 203361L),
      DstCommunities = Seq(538574949L, 1911619684L, 1911669584L, 1911671290L),
      TCPFlags = 0x18, IPFragmentID = 0xab4e, IPTTL = 61, IPTos = 8,
      SrcMAC = 0x948ed30a713bL, DstMAC = 0x22421f4a9fcdL)))
  }

  test("sflow: sampled IPv4 record without raw header") {
    assertFlows(sflow("sflow-sflow-ipv4-data"), Seq(baseline.copy(
      ExporterAddress = ip("49.49.49.49"), SamplingRate = 256, OutIf = 182,
      DstVlan = 3001, SrcAddr = ip("50.50.50.50"), DstAddr = ip("51.51.51.51"),
      Bytes = 1344, Packets = 1, EType = 2048, Proto = 17, SrcPort = 46622,
      DstPort = 58631, SrcMAC = 1094287164743L, DstMAC = 1101091482116L,
      IPFragmentID = 41647, IPTTL = 64)))
  }

  test("sflow: raw IPv4 packets (protocol 11)") {
    val t = baseline.copy(
      ExporterAddress = ip("172.19.64.116"), SamplingRate = 1, OutIf = 2,
      SrcAddr = ip("69.58.92.107"), Bytes = 32, Packets = 1, EType = 2048,
      Proto = 1, IPTTL = 64, IPTos = 8)
    assertFlows(sflow("sflow-sflow-raw-ipv4"), Seq(
      t.copy(DstAddr = ip("92.222.186.1"), IPFragmentID = 4329),
      t.copy(DstAddr = ip("92.222.184.1"), IPFragmentID = 62945)))
  }

  test("sflow: ICMPv4 and ICMPv6 from the raw header") {
    assertFlows(sflow("sflow-icmpv4"), Seq(baseline.copy(
      ExporterAddress = localhost, SamplingRate = 1,
      SrcAddr = ip("203.0.113.4"), DstAddr = ip("203.0.113.5"),
      Bytes = 84, Packets = 1, EType = 2048, Proto = 1,
      DstMAC = 0xd25b45ee5ecfL, SrcMAC = 0xe2efc68f8cd4L,
      ICMPv4Type = 8, IPTTL = 64, IPFragmentID = 0x90c5)))
    assertFlows(sflow("sflow-icmpv6"), Seq(baseline.copy(
      ExporterAddress = localhost, SamplingRate = 1,
      SrcAddr = ip("fe80::d05b:45ff:feee:5ecf"), DstAddr = ip("2001:db8::"),
      Bytes = 72, Packets = 1, EType = 34525, Proto = 58,
      SrcMAC = 0xd25b45ee5ecfL, DstMAC = 0xe2efc68f8cd4L,
      IPTTL = 255, ICMPv6Type = 135)))
  }

  test("sflow: QinQ keeps the outer VLAN") {
    assertFlows(sflow("sflow-qinq"), Seq(baseline.copy(
      ExporterAddress = ip("172.17.128.58"), SamplingRate = 4096,
      InIf = 369098852, OutIf = 369098851, SrcVlan = 1493, DstVlan = 1493,
      SrcAddr = ip("49.49.49.2"), DstAddr = ip("49.49.49.109"),
      Bytes = 80, Packets = 1, EType = 2048, Proto = 6,
      SrcMAC = 0x4caea3520ff6L, DstMAC = 0x000110621493L,
      IPTTL = 62, IPFragmentID = 56159, TCPFlags = 16,
      SrcPort = 32017, DstPort = 443)))
  }

  test("sflow: VXLAN decapsulation surfaces the inner packet") {
    assertFlows(sflow("sflow-encap-vxlan", decap = PacketParse.DecapVxlan),
      Seq(baseline.copy(
        ExporterAddress = localhost, SamplingRate = 1,
        SrcAddr = ip("2001:db8:4::1"), DstAddr = ip("2001:db8:4::3"),
        Bytes = 104, Packets = 1, EType = 34525, Proto = 58,
        SrcMAC = 0xca6e98f8498fL, DstMAC = 0x010203040506L,
        IPTTL = 64, ICMPv6Type = 128, IPv6FlowLabel = 0x0a461c)))
  }

  test("sflow: non-encapsulated packets yield nothing under decap") {
    for (n <- Seq("sflow-data-1140", "sflow-local-interface", "sflow-qinq",
      "sflow-sflow-raw-ipv4", "sflow-icmpv4"))
      assert(sflow(n, decap = PacketParse.DecapVxlan).isEmpty, n)
  }
}
