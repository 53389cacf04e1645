package graft.operators

import graft.SparkSpec
import graft.operators.similarity.SemDedup
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal centroids; vectors cluster on the axes
  private val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))

  private def corpus = Seq(
    (1L, Seq(1.00f, 0.01f)),  // cell 0
    (2L, Seq(0.99f, 0.02f)),  // cell 0, near-dup of 1
    (3L, Seq(0.01f, 1.00f)),  // cell 1
    (4L, Seq(0.02f, 0.99f)),  // cell 1, near-dup of 3
    (5L, Seq(-1.0f, 0.05f))   // cell 0 (least-negative cosine), no dup
  ).toDF("id", "embedding")

  test("flags intra-cell near-dups, keeping the lowest id") {
    val dups = SemDedup.dupCandidates(corpus, centroids, thresholdE6 = 990000L)
      .collect().map(r => r.getAs[Long]("dup_id") ->
        (r.getAs[Int]("cell"), r.getAs[Long]("near_id"))).toMap
    assert(dups.keySet == Set(2L, 4L))
    assert(dups(2L) == (0, 1L))
    assert(dups(4L) == (1, 3L))
  }

  test("the lowest qualifying neighbor wins when several exist") {
    val triple = Seq(
      (1L, Seq(1.00f, 0.00f)),
      (2L, Seq(0.999f, 0.01f)),
      (3L, Seq(0.998f, 0.02f))).toDF("id", "embedding")
    val dups = SemDedup.dupCandidates(triple, centroids, thresholdE6 = 990000L)
      .collect().map(r => r.getAs[Long]("dup_id") ->
        r.getAs[Long]("near_id")).toMap
    // 2 and 3 both dup against 1 (their lowest neighbor), never 3-vs-2's
    // higher option
    assert(dups == Map(2L -> 1L, 3L -> 1L))
  }

  test("cross-cell near-identical pairs are NOT flagged (the recall trade)") {
    // cosine(a, b) ≈ 0.9991 — far above threshold — but the pair straddles
    // the diagonal so the argmax assigns them to different cells
    val split = Seq(
      (1L, Seq(0.72f, 0.69f)),  // cell 0
      (2L, Seq(0.69f, 0.72f))). // cell 1
      toDF("id", "embedding")
    val dups = SemDedup.dupCandidates(split, centroids, thresholdE6 = 990000L)
    assert(dups.count() == 0)
  }

  test("survivors = corpus minus the flagged rows") {
    val ids = SemDedup.survivors(corpus, centroids, thresholdE6 = 990000L)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 5L))
  }

  test("assignment is projection-only: the sole exchanges are the pair join's") {
    val plan = SemDedup.dupCandidates(corpus, centroids, thresholdE6 = 990000L)
      .queryExecution.executedPlan.toString
    // cell-keyed join (both sides) + the per-dup window: no shuffle for
    // the centroid assignment itself (no join against a centroid table)
    assert(!plan.toLowerCase.contains("broadcastnestedloop"), plan)
    assert("(?i)exchange hashpartitioning".r.findAllMatchIn(plan).length <= 3,
      s"unexpected extra shuffles:\n$plan")
  }
}
