package graft.queryengine

import java.sql.Timestamp
import java.time.Instant
import graft.SparkSpec
import graft.schema.FlowSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LineQuerySpec extends SparkSpec {
  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  /** 4 hours of data: exporter A emits steadily on eth0, B bursts on eth1
    * in hour 2 only, hour 3 is empty.
    */
  private lazy val flows: DataFrame = {
    import spark.implicits._
    val rows = (0 until 120).map { m =>
      ("expA", "eth0", "external",
        Timestamp.from(Instant.parse("2024-03-01T00:00:00Z").plusSeconds(m * 60L)),
        100L, 1L, 1L)
    } ++ (0 until 60).map { m =>
      ("expB", "eth1", "external",
        Timestamp.from(Instant.parse("2024-03-01T01:00:00Z").plusSeconds(m * 60L)),
        10000L, 1L, 1L)
    }
    rows.toDF("ExporterName", "InIfName", "InIfBoundary", "TimeReceived",
      "Bytes", "Packets", "SamplingRate")
  }

  private lazy val tables = Seq(FlowTable("flows", 0L,
    ts("2024-03-01T00:00:00Z"), () => flows))

  private val engine = new LineQuery(FlowSchema.schema, tables)

  test("gap fill produces a dense axis with Other zero rows") {
    val out = engine.build(spark, LineInput(
      start = ts("2024-03-01T00:00:00Z"), end = ts("2024-03-01T04:00:00Z"),
      points = 240, dimensions = Seq("ExporterName"), limit = 1, unit = "fps"))
    val times = out.select("time_s").distinct().count()
    assert(times == 240) // every 1-minute bucket present
    // hour 3 has no data: bucket rows must be 'Other' with 0
    val h3 = out.where(col("time_s") >= lit(Instant.parse("2024-03-01T03:00:00Z")
      .getEpochSecond)).collect()
    assert(h3.nonEmpty)
    assert(h3.forall(r => r.getSeq[String](r.fieldIndex("dimensions")) == Seq("Other")
      && r.getAs[Double]("xps") == 0.0))
  }

  test("filters evaluate over the truncated source, like the reference CTE") {
    import spark.implicits._
    // two /24 networks, hosts .1/.2 — truncation to /24 zeroes the host
    val ipFlows = Seq(
      ("10.0.1.1", 100L), ("10.0.1.2", 100L), ("10.0.2.1", 100L))
      .map { case (ip, b) =>
        (graft.functions.Ip.parse(ip), ts("2024-03-01T00:30:00Z"), b, 1L, 1L)
      }.toDF("SrcAddr", "TimeReceived", "Bytes", "Packets", "SamplingRate")
    val t = Seq(FlowTable("flows", 0L, ts("2024-03-01T00:00:00Z"), () => ipFlows))
    val eng = new LineQuery(FlowSchema.schema, t)
    // filter names the truncated NETWORK address; both 10.0.1.x hosts
    // must match because the filter sees the post-REPLACE value
    // (reference: WHERE runs over the source CTE, graph.go/line.go)
    val out = eng.build(spark, LineInput(
      start = ts("2024-03-01T00:00:00Z"), end = ts("2024-03-01T01:00:00Z"),
      points = 6, dimensions = Seq("SrcAddr"), limit = 5, unit = "fps",
      filter = "SrcAddr = 10.0.1.0", truncateV4 = 24))
    val named = out.where(col("xps") > 0)
      .select(array_join(col("dimensions"), ","), col("xps"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(named.keySet == Set("10.0.1.0"), s"got $named")
    assert(named("10.0.1.0") * 600 == 2.0) // both /24 hosts counted
  }

  test("sankey truncates dimension addresses like the shared source CTE") {
    import spark.implicits._
    val ipFlows = Seq("10.0.1.1", "10.0.1.2", "10.0.2.1")
      .map(ip => (graft.functions.Ip.parse(ip),
        ts("2024-03-01T00:30:00Z"), 100L, 1L, 1L))
      .toDF("SrcAddr", "TimeReceived", "Bytes", "Packets", "SamplingRate")
    val t = Seq(FlowTable("flows", 0L, ts("2024-03-01T00:00:00Z"), () => ipFlows))
    val out = new SankeyQuery(FlowSchema.schema, t).build(spark, SankeyInput(
      start = ts("2024-03-01T00:00:00Z"), end = ts("2024-03-01T01:00:00Z"),
      dimensions = Seq("SrcAddr"), limit = 5, unit = "fps", truncateV4 = 24))
    val names = out.select("SrcAddr").as[String].collect().toSet
    assert(names == Set("10.0.1.0", "10.0.2.0"), s"got $names")
  }

  test("limitType avg ranks by total; max favors the burst") {
    def top(limitType: String): String = {
      val out = engine.build(spark, LineInput(
        start = ts("2024-03-01T00:00:00Z"), end = ts("2024-03-01T02:00:00Z"),
        points = 8, dimensions = Seq("ExporterName"), limit = 1,
        limitType = limitType, unit = "l3bps"))
      // non-Other row with highest xps belongs to the winner
      out.where(!array_contains(col("dimensions"), "Other"))
        .orderBy(desc("xps")).collect()(0).getSeq[String](2).head
    }
    // totals: A = 120*100, B = 60*10000 → B wins avg too; burst-only B wins max
    assert(top("max") == "expB")
    assert(top("avg") == "expB")
  }

  test("bidirectional adds reverse axis with flipped columns") {
    import spark.implicits._
    val both = flows.withColumn("OutIfName", lit("out0"))
      .withColumn("OutIfBoundary", lit("internal"))
    val t2 = Seq(FlowTable("flows", 0L, ts("2024-03-01T00:00:00Z"), () => both))
    val out = new LineQuery(FlowSchema.schema, t2).build(spark, LineInput(
      start = ts("2024-03-01T00:00:00Z"), end = ts("2024-03-01T02:00:00Z"),
      points = 8, dimensions = Seq("InIfName"), limit = 2,
      filter = "InIfBoundary = external", unit = "fps", bidirectional = true))
    val axes = out.select("axis").distinct().as[Int].collect().toSet
    assert(axes == Set(1, 2))
    // axis 2 groups by OutIfName and filters OutIfBoundary=external → no rows
    // except gap-fill 'Other' zeros
    val ax2 = out.where(col("axis") === 2 && col("xps") > 0).count()
    assert(ax2 == 0)
  }

  test("rollup routing picks coarsest fitting table") {
    val resolved = TableResolver.resolve(
      Seq(
        FlowTable("flows", 0L, ts("2024-03-01T00:00:00Z"), () => flows),
        FlowTable("1m", 60L, ts("2024-03-01T00:00:00Z"), () => flows),
        FlowTable("1h", 3600L, ts("2024-03-01T00:00:00Z"), () => flows),
        FlowTable("late", 3600L, ts("2024-03-01T02:00:00Z"), () => flows)),
      ts("2024-03-01T00:00:00Z"), ts("2024-03-02T00:00:00Z"),
      points = 24, mainTableRequired = false)
    assert(resolved.table.name == "1h")
    val main = TableResolver.resolve(
      Seq(FlowTable("flows", 0L, ts("2024-03-01T00:00:00Z"), () => flows),
        FlowTable("1h", 3600L, ts("2024-03-01T00:00:00Z"), () => flows)),
      ts("2024-03-01T00:00:00Z"), ts("2024-03-02T00:00:00Z"),
      points = 24, mainTableRequired = true)
    assert(main.table.name == "flows")
  }

  test("LineStats percentile interpolates and Other sorts last") {
    assert(math.abs(LineStats.percentile(Seq(1.0, 2.0, 3.0, 4.0), 0.95) - 3.85) < 1e-9)
    val s1 = LineStats.build(1, Seq("a"), Seq(1.0, 5.0, 3.0, 0.0))
    assert(s1.max == 5.0 && s1.min == 1.0 && s1.last == 3.0)
    assert(s1.average == 2.25)
  }
}
