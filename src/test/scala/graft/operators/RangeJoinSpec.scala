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

  // --- intervalOverlap ---

  private def leftSpans = Seq(
    (1L, 0L, 10L),    // overlaps 20, 21
    (2L, 10L, 11L),   // overlaps 21 only (touches 20 at 10 — no overlap)
    (3L, -20L, -5L),  // negative domain, overlaps 23
    (4L, 50L, 50L),   // empty
    (5L, 5L, 100L))   // long span: overlaps 20, 21, 22
    .toDF("lid", "ls", "le")
  private def rightSpans = Seq(
    (20L, 2L, 10L),
    (21L, 9L, 40L),
    (22L, 60L, 70L),
    (23L, -10L, -9L),
    (24L, 200L, 300L)) // overlaps nothing
    .toDF("rid", "rs", "re")

  private val expectedOverlap = Set(
    (1L, 20L), (1L, 21L), (2L, 21L), (3L, 23L),
    (5L, 20L), (5L, 21L), (5L, 22L))

  private def runOverlap(bucket: Long, bcast: Boolean = true) =
    RangeJoin.intervalOverlap(leftSpans, "ls", "le",
        rightSpans, "rs", "re", bucket, broadcastRight = bcast)
      .select("lid", "rid").as[(Long, Long)].collect()

  test("overlap matches the naive non-equi join, strict half-open") {
    val got = runOverlap(8L)
    assert(got.length == got.toSet.size)
    assert(got.toSet == expectedOverlap)
  }

  test("overlap is bucket-size independent, one claim per pair") {
    for (b <- Seq(1L, 3L, 7L, 16L, 1000L)) {
      val got = runOverlap(b)
      assert(got.length == got.toSet.size, s"bucket $b produced duplicates")
      assert(got.toSet == expectedOverlap, s"bucket $b diverged")
    }
  }

  test("overlap plans an equi join on both paths") {
    val plan = RangeJoin.intervalOverlap(leftSpans, "ls", "le",
      rightSpans, "rs", "re", 8L).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("NestedLoop"), plan)
    val plan2 = RangeJoin.intervalOverlap(leftSpans, "ls", "le",
        rightSpans, "rs", "re", 8L, broadcastRight = false)
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("NestedLoop"), plan2)
    assert(runOverlap(8L, bcast = false).toSet == expectedOverlap)
  }

  test("overlap with extra equi keys scopes per key") {
    val l = Seq((1L, 0L, 10L, "x"), (2L, 0L, 10L, "y")).toDF("lid", "ls", "le", "k")
    val r = Seq((10L, 5L, 15L, "x")).toDF("rid", "rs", "re", "k")
    val got = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re", 8L,
        keyCols = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("overlap rejects ambiguous shared column names") {
    val l = Seq((1L, 0L, 10L)).toDF("id", "s", "e")
    val r = Seq((2L, 5L, 15L)).toDF("id", "s2", "e2")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, "s", "e", r, "s2", "e2", 8L)
    }
  }
}
