package graft.queryengine

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side post-processing units (reference `console/line.go:390-446`
  * and `console/sankey.go:197-273`).
  */
class LineStatsSpec extends AnyFunSuite {

  test("percentile interpolates linearly between closest ranks") {
    val pts = Seq(10.0, 20.0, 30.0, 40.0)
    // rank = 0.95 * 3 = 2.85 → 30 + 0.85*(40-30)
    assert(math.abs(LineStats.percentile(pts, 0.95) - 38.5) < 1e-9)
    assert(LineStats.percentile(pts, 0.0) == 10.0)
    assert(LineStats.percentile(pts, 1.0) == 40.0)
    assert(LineStats.percentile(Seq(7.0), 0.95) == 7.0)
    assert(LineStats.percentile(Nil, 0.95) == 0.0)
  }

  test("build computes avg, nonzero min, max, last(-2)") {
    val s = LineStats.build(1, Seq("eth0"), Seq(0.0, 4.0, 2.0, 6.0))
    assert(s.average == 3.0)
    assert(s.min == 2.0) // zeros excluded
    assert(s.max == 6.0)
    assert(s.last == 2.0) // points(n-2): final bucket is partial
  }
}

class SankeyLinksSpec extends graft.SparkSpec {
  import spark.implicits._

  test("consecutive dimension pairs become weight-summed links") {
    val df = Seq(
      ("US", "FR", 5.0), ("US", "DE", 3.0), ("JP", "FR", 2.0),
      ("US", "FR", 1.5)) // duplicate edge merges
      .toDF("SrcCountry", "DstCountry", "weight")
    val sankey = new SankeyQuery(graft.schema.FlowSchema.schema, Seq.empty)
    val links = sankey.links(df, Seq("SrcCountry", "DstCountry"))
    val m = links.toMap
    assert(m(("SrcCountry: US", "DstCountry: FR")) == 6.5)
    assert(m(("SrcCountry: US", "DstCountry: DE")) == 3.0)
    assert(links.head._1 == ("SrcCountry: US", "DstCountry: FR")) // sorted by weight
  }
}
