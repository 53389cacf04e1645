package graft.decode

import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties of the RawFlow envelope codec (I1): encode∘decode
  * is the identity over the full field space, the field-3 fast scan agrees
  * with the full decode, and unknown fields skip cleanly — the proto3
  * compatibility contract that lets a newer inlet talk to this decoder.
  * Seeded, so failures reproduce.
  */
class RawFlowPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260813L)
  private val N = 500

  private def randBytes(max: Int): Array[Byte] = {
    val b = new Array[Byte](rnd.nextInt(max))
    rnd.nextBytes(b)
    b
  }

  private def randFlow(): RawFlow = RawFlow(
    timeReceived = rnd.nextLong().abs,
    payload = randBytes(64),
    sourceAddress = randBytes(20),
    useSourceAddress = rnd.nextBoolean(),
    decoder = rnd.nextInt(4),
    timestampSource = rnd.nextInt(3),
    decapsulationProtocol = rnd.nextInt(5),
    rateLimit = rnd.nextLong().abs)

  test("encode/decode round-trips every field") {
    (1 to N).foreach { _ =>
      val m = randFlow()
      val decoded = RawFlow.decode(RawFlow.encode(m))
      assert(decoded.isDefined)
      val d = decoded.get
      assert(d.timeReceived == m.timeReceived)
      assert(d.payload.toSeq == m.payload.toSeq)
      assert(d.sourceAddress.toSeq == m.sourceAddress.toSeq)
      assert(d.useSourceAddress == m.useSourceAddress)
      assert(d.decoder == m.decoder)
      assert(d.timestampSource == m.timestampSource)
      assert(d.decapsulationProtocol == m.decapsulationProtocol)
      assert(d.rateLimit == m.rateLimit)
    }
  }

  test("field-3 scan agrees with the full decode") {
    (1 to N).foreach { _ =>
      val m = randFlow()
      val bytes = RawFlow.encode(m)
      val scanned = RawFlow.sourceAddressOf(bytes)
      if (m.sourceAddress.isEmpty) assert(scanned.isEmpty)
      else assert(scanned.get.toSeq == m.sourceAddress.toSeq)
    }
  }

  test("unknown fields are skipped, known fields survive around them") {
    (1 to N).foreach { _ =>
      val m = randFlow()
      // splice an unknown varint field (12), bytes field (13), fixed64
      // (14) and fixed32 (15) after the known fields (field ≤ 15 keeps
      // the tag a single varint byte)
      val unknown =
        Array[Byte]((12 << 3).toByte, 0x07) ++
          Array[Byte](((13 << 3) | 2).toByte, 3, 1, 2, 3) ++
          Array[Byte](((14 << 3) | 1).toByte) ++ new Array[Byte](8) ++
          Array[Byte](((15 << 3) | 5).toByte) ++ new Array[Byte](4)
      val decoded = RawFlow.decode(RawFlow.encode(m) ++ unknown)
      assert(decoded.isDefined)
      assert(decoded.get.timeReceived == m.timeReceived)
      assert(decoded.get.payload.toSeq == m.payload.toSeq)
      assert(decoded.get.rateLimit == m.rateLimit)
      assert(RawFlow.sourceAddressOf(RawFlow.encode(m) ++ unknown)
        .map(_.toSeq) == (if (m.sourceAddress.isEmpty) None
        else Some(m.sourceAddress.toSeq)))
    }
  }
}
