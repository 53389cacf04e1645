package graft.schema

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaSpec extends SparkSpec {
  private val s = FlowSchema.schema

  test("Src columns expand to Dst, InIf to OutIf") {
    assert(s.byName.contains("SrcAddr") && s.byName.contains("DstAddr"))
    assert(s.byName.contains("InIfBoundary") && s.byName.contains("OutIfBoundary"))
    assert(s.byName("DstAddr").mainOnly && s.byName("DstAddr").truncatableIP)
  }

  test("mirrored alias columns read Dst inputs, not the Src originals") {
    import spark.implicits._
    val df = Seq((
      graft.functions.Ip.parse("10.0.0.1"), 24,
      graft.functions.Ip.parse("192.0.2.9"), 27))
      .toDF("SrcAddr", "SrcNetMask", "DstAddr", "DstNetMask")
    val out = s.withAliasColumns(df)
      .select("SrcNetPrefix", "DstNetPrefix").collect()(0)
    assert(out.getString(0) == "10.0.0.1/24")
    // the mechanical Src→Dst copy must rewrite the alias's column refs —
    // an unmapped copy would render the Src values here
    assert(out.getString(1) == "192.0.2.9/27")
  }

  test("reverseName flips direction and is an involution") {
    assert(s.reverseName("SrcAS") == "DstAS")
    assert(s.reverseName("OutIfName") == "InIfName")
    assert(s.reverseName("ExporterName") == "ExporterName")
    s.columns.map(_.name).foreach { n =>
      assert(s.reverseName(s.reverseName(n)) == n, s"not involutive for $n")
    }
  }

  test("rollup schema drops main-only columns") {
    val roll = s.rollupStructType.fieldNames.toSet
    assert(!roll.contains("SrcAddr"))
    assert(!roll.contains("SrcPort"))
    assert(!roll.contains("DstASPath"))
    assert(roll.contains("SrcAS"))
    assert(roll.contains("InIfName"))
  }

  test("alias columns compute PacketSize and bucket") {
    import spark.implicits._
    val df = Seq((1200L, 2L), (100L, 2L)).toDF("Bytes", "Packets")
    val out = s.withAliasColumns(df)
      .select(col("PacketSize"), col("PacketSizeBucket"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((600L, "512-767"), (50L, "0-63")))
  }

  test("config can enable groups and move columns") {
    val cfg = SchemaConfig(enabledGroups = Set("L3L4"),
      notMainTableOnly = Set("SrcAddr"))
    val s2 = s.withConfig(cfg)
    assert(s2.enabled.exists(_.name == "TCPFlags"))
    assert(!s2.byName("SrcAddr").mainOnly)
    assert(!s2.enabled.exists(_.name == "SrcMAC")) // L2 still off
  }

  test("structType contains no alias columns") {
    val st = s.structType
    assert(!st.fieldNames.contains("PacketSize"))
    assert(st("TimeReceived").dataType == TimestampType)
    assert(st("SrcAddr").dataType == BinaryType)
  }

  test("renderDim renders by column kind") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sd = s.withAsnNames(Map(64496L -> "EXAMPLE"))
    val df = Seq((graft.functions.Ip.parse("10.1.2.3"), 64496L, 64999L, 6L, 2048L,
      Seq(64496L, 64497L)))
      .toDF("SrcAddr", "SrcAS", "DstAS", "Proto", "EType", "DstASPath")
    val out = df.select(
      sd.renderDim("SrcAddr").as("ip"),
      sd.renderDim("SrcAS").as("asn"),
      sd.renderDim("DstAS").as("asn_miss"),
      sd.renderDim("Proto").as("proto"),
      sd.renderDim("EType").as("etype"),
      sd.renderDim("DstASPath").as("path")).collect()(0)
    assert(out.getString(0) == "10.1.2.3")
    assert(out.getString(1) == "64496: EXAMPLE")
    assert(out.getString(2) == "64999: ???")
    assert(out.getString(3) == "TCP")
    assert(out.getString(4) == "IPv4")
    assert(out.getString(5) == "64496 64497")
  }
}
