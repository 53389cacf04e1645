package graft.operators

import graft.SparkSpec
import graft.operators.pack.Curriculum
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("stages split by exact global percentile of the score") {
    val d = (1L to 8L).map(i => (i, i * 10L)).toDF("id", "score")
    val got = Curriculum.order(d, "id", "score", stages = 4, shards = 2)
      .select("id", "stage").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L))
  }

  test("equal scores share a stage (value-deterministic, no tiebreak)") {
    val d = (1L to 10L).map(i => (i, 7L)).toDF("id", "score")
    val stages = Curriculum.order(d, "id", "score", 4, 2)
      .select("stage").as[Long].collect().toSet
    assert(stages == Set(0L))
  }

  test("skewed ties land whole on one stage boundary side") {
    // 6 copies of score 1, 2 of score 2: ranks 0..5 and 6..7; stages=2
    // cuts at rank 4 — the tied block starts at rank 0 so ALL copies of
    // score 1 are stage 0 even though ranks 4,5 numerically pass the cut
    val d = ((1L to 6L).map(i => (i, 1L)) ++ Seq((7L, 2L), (8L, 2L)))
      .toDF("id", "score")
    val got = Curriculum.order(d, "id", "score", 2, 2)
      .select("score", "stage").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 0L), (2L, 1L)))
  }

  test("shard and slot are deterministic pure functions of the id") {
    val d = (1L to 50L).map(i => (i, i % 5)).toDF("id", "score")
    val a = Curriculum.order(d, "id", "score", 3, 8)
      .select("id", "shard", "slot").as[(Long, Long, Long)].collect().toSet
    val b = Curriculum.order(d, "id", "score", 3, 8)
      .select("id", "shard", "slot").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.map(_._2).forall(s => s >= 0 && s < 8))
    // hash sharding actually spreads (50 ids over 8 shards: all used
    // with overwhelming probability, and deterministic so never flaky)
    assert(a.map(_._2).size >= 6)
  }

  test("null scores land in NullStage, never silently deleted") {
    val d = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None), (4L, Some(30L)),
      (5L, None)).toDF("id", "score")
    val got = Curriculum.order(d, "id", "score", stages = 3, shards = 2)
      .select("id", "stage").as[(Long, Long)].collect().toMap
    // every input row survives; null-score rows get the explicit stage
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(3L) == Curriculum.NullStage && got(5L) == Curriculum.NullStage)
    // and the percentile cuts ignore nulls: 3 scored rows over 3 stages
    assert(got(1L) == 0L && got(2L) == 1L && got(4L) == 2L)
  }

  test("stage map broadcast-joins; no window ever runs over the corpus") {
    val d = (1L to 100L).map(i => (i, i % 10)).toDF("id", "score")
    val plan = Curriculum.order(d, "id", "score", 4, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only Window operates on the grouped value table (post-agg),
    // never on the raw corpus: its child subtree must contain the
    // HashAggregate that built the distinct-score table
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0)
    assert(plan.substring(winIdx).contains("HashAggregate"), plan)
  }
}
