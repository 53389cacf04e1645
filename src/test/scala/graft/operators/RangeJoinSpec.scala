package graft.operators

import graft.SparkSpec
import graft.operators.join.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L), (6L, -7L))
    .toDF("pid", "t")
  // overlapping, touching, empty, inverted, and negative-domain spans
  private def intervals = Seq(
    (10L, 0L, 20L),   // holds 5, 10, 19; 20 excluded (half-open)
    (11L, 10L, 30L),  // overlaps 10: 10, 19, 20
    (12L, 20L, 20L),  // empty — matches nothing
    (13L, 40L, 30L),  // inverted — matches nothing
    (14L, -10L, 0L))  // negative domain: holds -7
    .toDF("wid", "s", "e")

  private def run(bucket: Long, bcast: Boolean = true) =
    RangeJoin.pointInInterval(points, "t", intervals, "s", "e",
        bucket, broadcastIntervals = bcast)
      .select("pid", "wid").as[(Long, Long)].collect().toSet

  private val expected = Set(
    (1L, 10L), (2L, 10L), (3L, 10L),
    (2L, 11L), (3L, 11L), (4L, 11L),
    (6L, 14L))

  test("containment matches the naive non-equi join, half-open") {
    assert(run(bucket = 8L) == expected)
  }

  test("result is bucket-size independent (no dupes at any width)") {
    for (b <- Seq(1L, 3L, 7L, 16L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", b)
        .select("pid", "wid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bucket $b produced duplicates")
      assert(got.toSet == expected, s"bucket $b diverged")
    }
  }

  test("an interval ending on a bucket boundary does not leak into it") {
    // [0, 16) with bucket 16 must explode to bucket 0 only — a point at
    // t=16 (bucket 1) shares no bucket and never even meets the filter
    val p = Seq((1L, 16L), (2L, 15L)).toDF("pid", "t")
    val iv = Seq((7L, 0L, 16L)).toDF("wid", "s", "e")
    val got = RangeJoin.pointInInterval(p, "t", iv, "s", "e", 16L)
      .select("pid", "wid").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 7L)))
  }

  test("extra equi keys scope matches per key") {
    val p = Seq((1L, 5L, "x"), (2L, 5L, "y")).toDF("pid", "t", "k")
    val iv = Seq((10L, 0L, 10L, "x")).toDF("wid", "s", "e", "k")
    val got = RangeJoin.pointInInterval(p, "t", iv, "s", "e", 8L,
        keyCols = Seq("k"))
      .select("pid", "wid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("broadcast default plans a broadcast join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 8L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("NestedLoop"), plan)
    // non-broadcast path still equi-joins (shuffled hash / sort-merge)
    val plan2 = RangeJoin.pointInInterval(points, "t", intervals, "s", "e",
        8L, broadcastIntervals = false)
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("NestedLoop"), plan2)
  }

  test("non-broadcast path returns the same rows") {
    assert(run(bucket = 8L, bcast = false) == expected)
  }

  test("rejects a non-positive bucket") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 0L)
    }
  }
}
