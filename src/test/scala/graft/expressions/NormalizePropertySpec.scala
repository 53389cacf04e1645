package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Randomized properties of the canonical normalizer — normalization runs
  * before dedup, so its invariants (idempotence, spacing/case
  * insensitivity) decide whether two byte-different near-copies actually
  * merge. Seeded, so failures reproduce.
  */
class NormalizePropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)
  private val N = 500
  private val norm = NormalizeText(
    org.apache.spark.sql.catalyst.expressions.Literal("x"))

  private def n(s: String): String =
    norm.compute(UTF8String.fromString(s)).toString

  private val wsChars = Array(' ', '\t', '\n', '\f', '\r')
  private def randWord(): String =
    Seq.fill(1 + rnd.nextInt(6)) {
      val c = ('a' + rnd.nextInt(26)).toChar.toString
      if (rnd.nextBoolean()) c.toUpperCase else c
    }.mkString
  private def randWs(): String =
    Seq.fill(1 + rnd.nextInt(3))(wsChars(rnd.nextInt(wsChars.length))).mkString
  private def randText(): String = {
    val words = Seq.fill(rnd.nextInt(8))(randWord())
    randWs() * rnd.nextInt(2) + words.mkString(randWs()) +
      randWs() * rnd.nextInt(2)
  }

  test("idempotent: normalizing twice changes nothing") {
    (1 to N).foreach { _ =>
      val t = randText()
      assert(n(n(t)) == n(t), s"not idempotent on ${t.map(_.toInt)}")
    }
  }

  test("whitespace amount/kind and case never affect the result") {
    (1 to N).foreach { _ =>
      val words = Seq.fill(1 + rnd.nextInt(8))(randWord())
      val a = words.mkString(" ")
      val b = randWs() + words.map(w =>
        if (rnd.nextBoolean()) w.toUpperCase else w.toLowerCase)
        .mkString(randWs()) + randWs()
      assert(n(a) == n(b))
    }
  }

  test("output never has leading/trailing/doubled spaces or uppercase") {
    (1 to N).foreach { _ =>
      val out = n(randText())
      assert(!out.startsWith(" ") && !out.endsWith(" "))
      assert(!out.contains("  "))
      assert(out == out.toLowerCase(java.util.Locale.ROOT))
      wsChars.filter(_ != ' ').foreach(c => assert(!out.contains(c)))
    }
  }

  test("NFC: decomposed and precomposed forms normalize identically") {
    assert(n("Cafe\u0301") == n("Caf\u00e9")) // e+combining acute vs \u00e9
    assert(n("A\u030angstro\u0308m") == n("\u00c5ngstr\u00f6m"))
  }
}
