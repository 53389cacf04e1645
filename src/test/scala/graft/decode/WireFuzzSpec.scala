package graft.decode

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Rib

/** Session-codec fuzz: arbitrary bytes from the network must never
  * throw past the decoder boundary, never loop, and never desynchronize
  * the framer (seeded — failures replay).
  */
class WireFuzzSpec extends AnyFunSuite {

  test("BmpDecoder.messages is total on random bytes and always advances") {
    val rnd = new Random(90125)
    for (_ <- 1 to 2000) {
      val buf = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(buf)
      val (events, consumed) = BmpDecoder.messages(buf)
      assert(consumed >= 0 && consumed <= buf.length)
      // feeding whatever came out must not corrupt a live RIB either
      BmpDecoder.feed(new Rib.Live, events)
    }
  }

  test("random mutations of a valid BMP message stay contained") {
    val rnd = new Random(5150)
    val base = BmpFixtures.announceMsg
    for (_ <- 1 to 2000) {
      val buf = base.clone()
      val flips = 1 + rnd.nextInt(6)
      (1 to flips).foreach { _ =>
        buf(rnd.nextInt(buf.length)) = rnd.nextInt(256).toByte
      }
      val (events, consumed) = BmpDecoder.messages(buf)
      assert(consumed >= 0 && consumed <= buf.length)
      BmpDecoder.feed(new Rib.Live, events)
    }
  }

  test("a forged giant length cannot stall the framer") {
    // version 3, length 0x7fffffff, type 0 — must be Malformed, not
    // "wait for 2 GB"
    val forged = Array[Byte](3, 0x7f, -1, -1, -1, 0)
    val (events, consumed) = BmpDecoder.messages(forged)
    assert(events.exists(_.isInstanceOf[BmpDecoder.Malformed]))
    assert(consumed == forged.length)
  }

  test("SnmpCodec.decode is total-or-IllegalArgument on random bytes") {
    val rnd = new Random(2112)
    for (_ <- 1 to 2000) {
      val buf = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(buf)
      // IllegalArgumentException is the ONLY sanctioned failure — it is
      // what the poller catches; a bounds error escaping here would kill
      // the polling loop on a malformed agent response
      try { SnmpCodec.decode(buf); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
