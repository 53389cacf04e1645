package graft.operators

import graft.SparkSpec
import graft.operators.sketch.Kmv
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups: "a" tiny (below any k), "b" mid, "c" large with repeats
  private def data = (
    (1 to 3).map(i => ("a", s"v$i")) ++
    (1 to 40).map(i => ("b", s"w$i")) ++
    (1 to 200).flatMap(i => Seq(("c", s"x$i"), ("c", s"x$i")))
  ).toDF("g0", "v")

  test("groups below k are exact (match countDistinct)") {
    val est = Kmv.groupedWithUnion(data, "g0", "v", k = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est("a") == ((3L, 3L)), "3 distinct < k: sketch is the set")
    assert(est("b")._1 == 16L, "full sketch keeps exactly k rows")
  }

  test("estimator is (k-1)*2^48 div kth for full groups") {
    val k = 16
    val sk = Kmv.sketch(data.where($"g0" === "c"), "g0", "v", k)
      .orderBy("rk").collect()
    assert(sk.length == k)
    val kth = sk.last.getLong(1)
    val expected = (k - 1).toLong * Kmv.HashSpace / kth
    val est = Kmv.estimate(Kmv.sketch(data, "g0", "v", k), k)
      .where($"g" === "c").head()
    assert(est.getLong(2) == expected, "hand-computed estimator value")
    // 200 true distincts; KMV with k=16 should land within ~2x
    assert(est.getLong(2) > 100 && est.getLong(2) < 400,
      s"estimate ${est.getLong(2)} wildly off for 200 distincts")
  }

  test("merge identity: union of per-group sketches == sketch of union") {
    val k = 16
    val merged = Kmv.estimate(
      Kmv.mergeAll(Kmv.sketch(data, "g0", "v", k), k), k).head()
    val direct = Kmv.estimate(
      Kmv.sketch(data.withColumn("g0", lit("__union")), "g0", "v", k), k)
      .head()
    assert(merged.getLong(1) == direct.getLong(1))
    assert(merged.getLong(2) == direct.getLong(2))
  }

  test("nulls are excluded (COUNT DISTINCT semantics)") {
    val withNulls = data.unionAll(
      Seq(("a", null), ("c", null)).toDF("g0", "v"))
    val a = Kmv.groupedWithUnion(withNulls, "g0", "v", k = 16)
      .where($"g" === "a").head()
    assert(a.getLong(1) == 3L && a.getLong(2) == 3L,
      "null must not inflate the exact count or displace a minimum")
  }

  test("non-string group keys get a stable string schema") {
    val ints = Seq((1, "a"), (1, "b"), (2, "c")).toDF("g0", "v")
    val out = Kmv.groupedWithUnion(ints, "g0", "v", k = 4)
    assert(out.schema("g").dataType.typeName == "string")
    val m = out.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m == Map("1" -> 2L, "2" -> 1L, "__union" -> 3L))
  }

  test("k bounds are enforced") {
    intercept[IllegalArgumentException] { Kmv.sketch(data, "g0", "v", 1) }
    intercept[IllegalArgumentException] { Kmv.sketch(data, "g0", "v", 40000) }
  }

  test("pairwise Jaccard is exact below k and plausible above") {
    // A = {1..30}, B = {21..50}: |inter| = 10, |union| = 50, J = 0.2
    val ab = ((1 to 30).map(i => ("A", s"t$i")) ++
      (21 to 50).map(i => ("B", s"t$i"))).toDF("g0", "v")
    val exact = Kmv.pairwiseJaccard(Kmv.sketch(ab, "g0", "v", 64), 64).head()
    assert(exact.getString(0) == "A" && exact.getString(1) == "B")
    assert(exact.getLong(2) == 50L && exact.getLong(3) == 10L)
    assert(exact.getLong(4) == 200L)
    // estimator regime: 500-value sets overlapping in 250 (J = 1/3);
    // md5 is deterministic, so this is a fixed value, not a flaky bound
    val big = ((1 to 500).map(i => ("A", s"u$i")) ++
      (251 to 750).map(i => ("B", s"u$i"))).toDF("g0", "v")
    val est = Kmv.pairwiseJaccard(Kmv.sketch(big, "g0", "v", 32), 32).head()
    assert(est.getLong(2) == 32L, "union sample truncates to k")
    assert(est.getLong(4) > 100L && est.getLong(4) < 600L,
      s"J=1/3 estimate wildly off: ${est.getLong(4)}")
  }

  test("regroup identity: rollup of fine sketches == direct coarse sketch") {
    val d = (1 to 300).map(i => (s"t${i % 3}|h${i % 7}", s"u${i % 90}"))
      .toDF("g0", "v")
    val k = 8
    val fine = Kmv.sketch(d, "g0", "v", k)
    val rolled = Kmv.regroup(fine, substring_index($"g", "|", 1), k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val direct = Kmv.sketch(
      d.withColumn("g0", substring_index($"g0", "|", 1)), "g0", "v", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(rolled == direct,
      "k-min of unioned per-subgroup k-mins must equal the direct k-min")
  }

  test("domain quantiles are exact below k") {
    val d = (1 to 40).map(i => ("a", i.toLong)).toDF("g0", "v")
    val q = Kmv.domainQuantiles(
      Kmv.sketchWithValues(d, "g0", "v", 64), Seq(50, 90)).head()
    assert(q.getLong(1) == 40L)
    assert(q.getLong(2) == 20L, "p50 of 1..40 at ceil-rank 20")
    assert(q.getLong(3) == 36L, "p90 of 1..40 at ceil-rank 36")
  }
}
