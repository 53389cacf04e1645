package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Runtime skew handling: when a shuffle join's key distribution is
  * pathological (one hot key owning most rows) and the small side is NOT
  * broadcastable, the engine's answer is AQE's skew-join split — a hot
  * partition is divided into sub-partitions at runtime, so one straggler
  * task stops bounding the stage. This spec pins that the posture
  * actually engages on a planted hot key, which is what lets every
  * non-broadcast equi-join in the suite survive a skewed 100 TB key
  * distribution without hand-rolled salting. (Where a join could
  * degenerate quadratically rather than merely skew — the shingle pair
  * join — the df-cap is the guard, measured in the 10× rehearsal;
  * salting would not help there because the hot key is hot on BOTH
  * sides.)
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a planted hot partition in a sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force the shuffle-join path and make the skew detector's
      // thresholds small enough that a test-sized hot partition trips it
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 50k rows on one hot key + a uniform tail; the dim side carries
      // every key so the join must shuffle both sides
      val facts = spark.range(0, 52000)
        .select(when($"id" < 50000, lit(7L)).otherwise($"id" % 97).as("k"),
          concat(lit("payload-with-some-width-"), $"id").as("v"))
      val dim = spark.range(0, 97).select($"id".as("k"),
        concat(lit("dim"), $"id").as("d"))
      val joined = facts.join(dim, "k")
      // execute THIS queryExecution: AQE finalizes its plan only when the
      // same physical plan object actually runs (count() would plan anew)
      assert(joined.collect().length == 52000)
      val exec = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(exec.nonEmpty, "expected an adaptive plan")
      val finalPlan = exec.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE never flagged the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
