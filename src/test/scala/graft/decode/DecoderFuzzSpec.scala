package graft.decode

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Ip

/** Robustness net for the wire decoders: no input — truncated, bit-flipped
  * or random — may throw. A malformed datagram that escaped as an
  * exception would fail the Spark task and, after retries, the whole
  * ingest query; the decoders must degrade to error results
  * (the reference wraps decoders in panic recovery,
  * `outlet/flow/decoder.go:60-71`).
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private val localhost = Ip.parse("127.0.0.1")

  private def pcap(name: String): Array[Byte] =
    Pcap.l4(Pcap.readResource(s"/graft/pcap/$name.pcap"))

  private def netflowSurvives(payload: Array[Byte]): Unit = {
    val r = NetflowDecoder.decode(payload, localhost, 0L,
      DecodeOptions(), TemplateState.empty)
    assert(r != null)
  }

  private def sflowSurvives(payload: Array[Byte]): Unit =
    assert(SflowDecoder.decode(payload, 0L, DecodeOptions()) != null)

  test("every truncation of valid datagrams decodes without throwing") {
    for (name <- Seq("template", "data", "options-template", "options-data",
      "nfv5", "ipfixprobe-templates", "ipfixprobe-data")) {
      val full = pcap(name)
      (0 to full.length).foreach(n => netflowSurvives(full.take(n)))
    }
    val sf = pcap("sflow-data-1140")
    (0 to sf.length).foreach(n => sflowSurvives(sf.take(n)))
  }

  test("single-byte corruptions decode without throwing") {
    val rnd = new scala.util.Random(0x5eed)
    for (name <- Seq("template", "data", "nfv5")) {
      val full = pcap(name)
      (1 to 200).foreach { _ =>
        val mutated = full.clone()
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
        netflowSurvives(mutated)
      }
    }
    val sf = pcap("sflow-data-1140")
    (1 to 200).foreach { _ =>
      val mutated = sf.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      sflowSurvives(mutated)
    }
  }

  test("random garbage decodes without throwing") {
    val rnd = new scala.util.Random(0xfeedL)
    (1 to 500).foreach { _ =>
      val len = rnd.nextInt(300)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      // force version markers half the time so the parse gets past the
      // version switch and into the structural code
      if (len >= 2 && rnd.nextBoolean()) {
        bytes(0) = 0
        bytes(1) = Seq(5, 9, 10)(rnd.nextInt(3)).toByte
      }
      netflowSurvives(bytes)
      if (len >= 4 && rnd.nextBoolean()) {
        bytes(0) = 0; bytes(1) = 0; bytes(2) = 0; bytes(3) = 5
      }
      sflowSurvives(bytes)
      assert(RawFlow.decode(bytes) != null) // Option, never a throw
      assert(RawFlow.sourceAddressOf(bytes) != null)
    }
  }

  test("pcap reader survives truncations and garbage") {
    val full = Pcap.readResource("/graft/pcap/template.pcap")
    (24 to full.length).foreach { n =>
      Pcap.datagrams(full.take(n)) // may return fewer datagrams, not throw
    }
    val rnd = new scala.util.Random(0xca4)
    (1 to 200).foreach { _ =>
      val bytes = new Array[Byte](24 + rnd.nextInt(120))
      rnd.nextBytes(bytes)
      bytes(0) = 0xa1.toByte; bytes(1) = 0xb2.toByte
      bytes(2) = 0xc3.toByte; bytes(3) = 0xd4.toByte
      try Pcap.datagrams(bytes)
      catch { case _: IllegalArgumentException => () } // reject is fine
    }
  }
}
