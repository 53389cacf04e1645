package graft.functions

import graft.SparkSpec

class LpmSpec extends SparkSpec {

  private val table = Lpm.Table.build(Seq(
    Lpm.PrefixEntry("10.0.0.0/8", Map("tier" -> "corp", "region" -> "global")),
    Lpm.PrefixEntry("10.1.0.0/16", Map("site" -> "paris")),
    Lpm.PrefixEntry("10.1.2.0/24", Map("rack" -> "r7", "site" -> "paris-dc2")),
    Lpm.PrefixEntry("192.168.0.0/16", Map("tier" -> "lab")),
    Lpm.PrefixEntry("2001:db8::/32", Map("tier" -> "v6test"))))

  private def look(ip: String) = table.lookup(Ip.parse(ip))

  test("most specific prefix wins") {
    assert(look("10.1.2.3").get("rack") == "r7")
    assert(look("10.1.9.9").get("site") == "paris")
    assert(look("10.9.9.9").get("tier") == "corp")
  }

  test("children inherit ancestor attributes, overrides win") {
    val deep = look("10.1.2.3").get
    assert(deep("tier") == "corp")      // from /8
    assert(deep("region") == "global")  // from /8
    assert(deep("site") == "paris-dc2") // /24 overrides /16
  }

  test("no match outside all prefixes, v6 matches v6") {
    assert(look("11.0.0.1").isEmpty)
    assert(look("172.16.0.1").isEmpty)
    assert(look("2001:db8::1").get("tier") == "v6test")
    assert(look("2001:db9::1").isEmpty)
  }

  test("adjacent same-length prefixes do not bleed") {
    assert(look("192.168.255.255").get("tier") == "lab")
    assert(look("192.169.0.0").isEmpty)
  }
}
