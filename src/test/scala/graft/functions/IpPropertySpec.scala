package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Randomized-property coverage of the IP codec and LPM machinery — these
  * drive subnet filters, truncation, and the networks join, so edge cases
  * (prefix boundaries, v4-mapped space, nesting) matter more than typical
  * values. Seeded, so failures reproduce.
  */
class IpPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)
  private val N = 300

  private def randV4(): String =
    Seq.fill(4)(rnd.nextInt(256)).mkString(".")

  test("v4 parse/render roundtrip") {
    (1 to N).foreach { _ =>
      val ip = randV4()
      assert(Ip.render(Ip.parse(ip)) == ip)
    }
  }

  test("truncation is idempotent, monotone-down, and prefix-preserving") {
    (1 to N).foreach { _ =>
      val ip = randV4()
      val bits = rnd.nextInt(33)
      val b = Ip.parse(ip)
      val t = Ip.truncate(b, 96 + bits)
      assert(java.util.Arrays.equals(t, Ip.truncate(t, 96 + bits)))
      assert(Ip.compareBytes(t, b) <= 0)
      if (bits == 32) assert(java.util.Arrays.equals(t, b))
    }
  }

  test("cidrRange brackets exactly the masked range") {
    (1 to N).foreach { _ =>
      val ip = randV4()
      val bits = rnd.nextInt(33)
      val (lo, hi) = Ip.cidrRange(s"$ip/$bits")
      val addr = Ip.parse(ip)
      assert(Ip.compareBytes(lo, addr) <= 0 && Ip.compareBytes(addr, hi) <= 0)
      assert(java.util.Arrays.equals(lo, Ip.truncate(addr, 96 + bits)))
    }
  }

  test("LPM lookup agrees with brute-force most-specific scan") {
    (1 to 60).foreach { _ =>
      val entries = (0 until 12).map { i =>
        val bits = 8 + rnd.nextInt(25)
        val base = Ip.render(Ip.truncate(Ip.parse(randV4()), 96 + bits))
        Lpm.PrefixEntry(s"$base/$bits", Map("id" -> i.toString))
      }
      val table = Lpm.Table.build(entries)
      (1 to 20).foreach { _ =>
        // probe near an entry half the time to hit containment paths
        val probe = if (rnd.nextBoolean()) randV4()
          else entries(rnd.nextInt(entries.size)).cidr.split("/")(0)
        val addr = Ip.parse(probe)
        val containing = entries.filter { e =>
          val (lo, hi) = Ip.cidrRange(e.cidr)
          Ip.compareBytes(lo, addr) <= 0 && Ip.compareBytes(addr, hi) <= 0
        }
        val got = table.lookup(addr)
        if (containing.isEmpty) assert(got.isEmpty, s"probe $probe")
        else {
          val maxBits = containing.map(_.cidr.split("/")(1).toInt).max
          val winners = containing.filter(_.cidr.split("/")(1).toInt == maxBits)
          assert(got.isDefined, s"probe $probe should match")
          // the id must come from one of the most-specific prefixes
          // (duplicate prefixes merge attrs, later wins — accept any winner)
          assert(winners.exists(w => got.get.get("id")
            .exists(id => entries(id.toInt).cidr == w.cidr)),
            s"probe $probe got ${got.get} want one of ${winners.map(_.cidr)}")
        }
      }
    }
  }
}
