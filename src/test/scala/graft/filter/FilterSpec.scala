package graft.filter

import graft.SparkSpec
import graft.schema.FlowSchema

/** Filter-DSL corpus (FIXTURES.md §5, ported from the reference's
  * `console/filter/parser_test.go` shapes): accept/reject, reverse
  * direction, mainTableRequired.
  */
class FilterSpec extends SparkSpec {
  private val schema = FlowSchema.schema

  private def compile(s: String) =
    FilterCompiler.compile(schema, s).fold(e => fail(s"parse failed: $e"), identity)

  test("accepts the representative corpus") {
    val corpus = Seq(
      "InIfBoundary = external",
      "Proto = 'TCP' AND SrcPort >= 1024",
      "SrcAddr << 10.0.0.0/8 OR DstAddr !<< 2001:db8::/32",
      "SrcAddr IN (192.0.2.1, 198.51.100.0/24)",
      "DstASPath = AS65000 AND DstCommunities = 65000:100",
      "DstCommunities = 65000:100:200",
      "ExporterName LIKE 'edge%' AND InIfDescription IUNLIKE '%backup%'",
      "SrcNetPrefix = 192.0.2.0/27",
      "EType = IPv4 AND FlowDirection = ingress",
      "NOT (SrcCountry = 'FR' OR DstCountry = 'FR')",
      "SrcAS IN (AS64501, 64502)",
      "ForwardingStatus >= 128 -- comment\n AND Proto = 6",
      "Proto = 6 /* block */ AND SrcAS != AS65000")
    corpus.foreach(c => compile(c))
  }

  test("rejects malformed input with expected sets") {
    val bad = Seq(
      "NoSuchColumn = 1",
      "SrcAddr = ",
      "Proto = 'NOTAPROTO'",
      "InIfBoundary = outside",
      "SrcPort LIKE 'x'", // LIKE not valid on uint
      "SrcAddr << banana")
    bad.foreach { c =>
      assert(FilterCompiler.compile(schema, c).isLeft, s"should reject: $c")
    }
  }

  test("mainTableRequired set for main-only columns") {
    assert(compile("SrcAddr << 10.0.0.0/8").mainTableRequired)
    assert(compile("SrcPort = 443").mainTableRequired)
    assert(!compile("SrcAS = 64500 AND InIfBoundary = external").mainTableRequired)
  }

  test("reverse predicate swaps Src/Dst and In/Out") {
    val cf = compile("SrcCountry = 'US' AND InIfBoundary = external")
    assert(cf.predicate.toString.contains("SrcCountry"))
    assert(cf.reversePredicate.toString.contains("DstCountry"))
    assert(cf.reversePredicate.toString.contains("OutIfBoundary"))
  }

  test("predicates evaluate on real rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (graft.functions.Ip.parse("10.1.1.1"), 6L, 443, "external", "US"),
      (graft.functions.Ip.parse("192.0.2.7"), 17L, 53, "internal", "FR"))
      .toDF("SrcAddr", "Proto", "SrcPort", "InIfBoundary", "SrcCountry")
    val cf = compile("SrcAddr << 10.0.0.0/8 AND Proto = 'TCP'")
    assert(df.where(cf.predicate).count() == 1)
    val in = compile("SrcAddr IN (192.0.2.7, 10.0.0.0/8)")
    assert(df.where(in.predicate).count() == 2)
    val boundary = compile("InIfBoundary = external")
    assert(df.where(boundary.predicate).count() == 1)
  }

  test("community filters hit packed values") {
    import spark.implicits._
    val df = Seq(
      (Seq((65000L << 16) | 100L), Seq.empty[java.math.BigDecimal]),
      (Seq((64999L << 16) | 1L), Seq.empty[java.math.BigDecimal]))
      .toDF("DstCommunities", "DstLargeCommunities")
    val cf = compile("DstCommunities = 65000:100")
    assert(df.where(cf.predicate).count() == 1)
  }

  test("expected tokens power completion") {
    val exp = FilterParser.expectedAt(schema, "SrcPort ")
    assert(exp.exists(Set("=", "!=", ">=", "IN")))
  }

  // MAC columns are in the L2 feature group, disabled by default like the
  // reference; enable the group for the MAC cases
  private val l2Schema = schema.withConfig(
    graft.schema.SchemaConfig(enabledGroups = Set("L2")))

  private def compileL2(s: String) =
    FilterCompiler.compile(l2Schema, s).fold(e => fail(s"parse failed: $e"), identity)

  test("mac, column-to-column, NOTIN, direction forms parse and compile") {
    compileL2("SrcMAC = 00:11:22:33:44:55")
    compileL2("DstMAC != aa-bb-cc-dd-ee-ff")
    val corpus = Seq(
      "InIfName = OutIfName", // column-to-column compare
      "SrcCountry NOTIN ('US', 'FR')",
      "SrcAddr NOTIN (192.0.2.1, 10.0.0.0/8)",
      "FlowDirection = egress",
      "Proto IN (6, 17)",
      "EType = 'IPv6'")
    corpus.foreach(c => compile(c))
    // and the group gate itself: disabled by default
    assert(FilterCompiler.compile(schema, "SrcMAC = 00:11:22:33:44:55").isLeft)
  }

  test("NOTIN and column compare evaluate correctly") {
    import spark.implicits._
    val df = Seq(
      ("US", "eth0", "eth0", 6L),
      ("FR", "eth0", "eth1", 17L),
      ("DE", "eth2", "eth2", 1L))
      .toDF("SrcCountry", "InIfName", "OutIfName", "Proto")
    assert(df.where(compile("SrcCountry NOTIN ('US', 'FR')").predicate).count() == 1)
    assert(df.where(compile("InIfName = OutIfName").predicate).count() == 2)
    assert(df.where(compile("Proto IN (6, 17)").predicate).count() == 2)
  }

  test("out-of-range literals are positioned errors, never exceptions") {
    val schema = graft.schema.FlowSchema.schema
    // each of these used to throw NumberFormatException out of parse()
    Seq(
      "Proto = 99999999999999999999",            // > Long.MaxValue
      "Proto = 0x11111111111111111",             // > 16 hex digits
      "SrcMAC = aa::bb",                          // empty MAC segment
      "SrcMAC = aa:bb:cc:dd:ee",                  // 5 groups
      "DstCommunities = 1:65536",                 // 16-bit half overflow
      "DstCommunities = 65536:0",
      "DstCommunities = 1:2:4294967296"           // 32-bit word overflow
    ).foreach { f =>
      val r = FilterParser.parse(schema, f)
      assert(r.isLeft, s"expected parse error for: $f")
    }
    // boundary values still parse
    assert(FilterParser.parse(schema, "DstCommunities = 65535:65535").isRight)
    assert(FilterParser.parse(schema,
      "DstCommunities = 4294967295:0:4294967295").isRight)
  }

  test("mac filter hits numeric MAC columns") {
    import spark.implicits._
    val df = Seq(
      graft.functions.Render.macToNum("00:11:22:33:44:55"),
      graft.functions.Render.macToNum("aa:bb:cc:dd:ee:ff"))
      .toDF("SrcMAC")
    assert(df.where(compileL2("SrcMAC = 00:11:22:33:44:55").predicate).count() == 1)
  }

  test("large community filter targets the LargeCommunities column") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val packed = graft.functions.Render.packLargeCommunity(65000L, 100L, 200L)
    val sch = StructType(Seq(
      StructField("DstCommunities", ArrayType(LongType)),
      StructField("DstLargeCommunities", ArrayType(DecimalType(38, 0)))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(Seq.empty[Long], Seq(packed)),
        Row(Seq.empty[Long], Seq.empty[java.math.BigDecimal])),
      sch)
    val cf = compile("DstCommunities = 65000:100:200")
    assert(df.where(cf.predicate).count() == 1)
  }

  test("custom-dict generated columns become filterable dimensions") {
    import spark.implicits._
    val dictSource = Seq((64496L, "gold"), (64497L, "silver")).toDF("asn", "tier")
    val dict = graft.schema.CustomDict("astiers", "SrcAS", "asn",
      Map("tier" -> "SrcASTier"))
    val extended = schema.withCustomDict(dict)
    assert(FilterCompiler.compile(schema, "SrcASTier = 'gold'").isLeft)
    val cf = FilterCompiler.compile(extended, "SrcASTier = 'gold'")
      .fold(e => fail(s"parse failed: $e"), identity)
    val flows = Seq((64496L, 1L), (64497L, 2L), (64999L, 3L)).toDF("SrcAS", "Bytes")
    val enriched = graft.streaming.Enrichment.withCustomDict(flows, dict, dictSource)
    assert(enriched.where(cf.predicate).count() == 1)
    assert(enriched.where(org.apache.spark.sql.functions.col("SrcASTier") === "???")
      .count() == 1)
  }

  test("custom-dict duplicate keys resolve deterministically") {
    import spark.implicits._
    // two rows for the same key, shuffled across partitions: the surviving
    // attribute tuple must be the lexicographic min regardless of layout
    val dictSource = Seq((64496L, "silver"), (64496L, "gold"), (64497L, "iron"))
      .toDF("asn", "tier").repartition(5)
    val dict = graft.schema.CustomDict("astiers", "SrcAS", "asn",
      Map("tier" -> "SrcASTier"))
    val flows = Seq((64496L, 1L), (64497L, 2L)).toDF("SrcAS", "Bytes")
    val out = graft.streaming.Enrichment.withCustomDict(flows, dict, dictSource)
      .select("SrcAS", "SrcASTier").as[(Long, String)].collect().toMap
    assert(out == Map(64496L -> "gold", 64497L -> "iron"))
    assert(out.size == 2) // no fan-out from the duplicate key
  }

  test("aspath membership compiles to array_contains") {
    import spark.implicits._
    val df = Seq(Seq(64496L, 65000L), Seq(64497L)).toDF("DstASPath")
    assert(df.where(compile("DstASPath = AS65000").predicate).count() == 1)
    assert(df.where(compile("DstASPath != 65000").predicate).count() == 1)
  }
}
