package graft.filter

import org.scalatest.funsuite.AnyFunSuite

/** The parser must never throw — every input, however malformed, yields
  * either a compiled filter or a positioned error (the reference returns
  * parse errors with `Expected` sets for completion; an exception would
  * take the console down instead). Seeded, so failures reproduce.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val schema = graft.schema.FlowSchema.schema
  private val rnd = new scala.util.Random(20260812L)
  private val N = 500

  private def check(s: String): Unit =
    FilterCompiler.compile(schema, s) match {
      case Right(cf) => assert(cf.predicate != null)
      case Left(err) => assert(err.pos >= 0 && err.pos <= s.length + 1,
        s"error position ${err.pos} outside input of length ${s.length}")
    }

  test("arbitrary ASCII never throws; outcome is always Left or Right") {
    (1 to N).foreach { _ =>
      val len = rnd.nextInt(60)
      check(Seq.fill(len)((32 + rnd.nextInt(95)).toChar).mkString)
    }
  }

  test("mutations of valid filters never throw") {
    val valid = Seq(
      "SrcPort >= 1024 AND Proto = 'TCP'",
      "InIfBoundary = external OR OutIfBoundary = external",
      "SrcAddr << 10.0.0.0/8 AND NOT (DstPort IN (80, 443))",
      "DstASPath = AS65000 -- comment")
    val chars = "()'\"\\ x0<,=".toCharArray
    (1 to N).foreach { _ =>
      val base = valid(rnd.nextInt(valid.length))
      val pos = rnd.nextInt(base.length + 1)
      val ch = chars(rnd.nextInt(chars.length))
      check(base.substring(0, pos) + ch + base.substring(pos))
    }
  }

  test("deep nesting and long operator chains stay linear") {
    val deep = "(" * 200 + "SrcPort = 1" + ")" * 200
    check(deep)
    val chain = (1 to 200).map(i => s"SrcPort = $i").mkString(" OR ")
    check(chain)
  }
}
