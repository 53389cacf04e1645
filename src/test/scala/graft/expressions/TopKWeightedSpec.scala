package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKWeightedSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct keys fit the capacity, across partitions") {
    val df = spark.range(0, 10000).repartition(8)
      .select((col("id") % 50).cast("string").as("k"),
        (col("id") % 7 + 1).as("w"))
    val sketch = df.agg(TopKWeighted(col("k"), col("w"), 10, 20).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.key"), col("e.weight"))
      .as[(String, Long)].collect().toSeq
    val exact = df.groupBy("k").agg(sum("w").as("w"))
      .orderBy(desc("w"), asc("k")).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(sketch == exact)
  }

  test("under eviction pressure the heavy hitter survives with bounded error") {
    // one key carries half the total weight; capacity far below distinct keys
    val df = spark.range(0, 20000)
      .select(when(col("id") % 2 === 0, "heavy")
        .otherwise(concat(lit("k"), (col("id") % 997).cast("string"))).as("k"),
        lit(1L).as("w"))
    val top = df.agg(TopKWeighted(col("k"), col("w"), 5, 4).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.key"), col("e.weight"))
      .as[(String, Long)].collect()
    assert(top.length == 5)
    assert(top.head._1 == "heavy")
    // SpaceSaving overestimates: count ≤ true + N/capacity
    val n = 20000L
    assert(top.head._2 >= 10000L && top.head._2 <= 10000L + n / 20)
  }

  test("integral weights widen; fractional and swapped args are rejected") {
    val df = Seq(("a", 5), ("a", 2), ("b", 3)).toDF("k", "w") // w is IntegerType
    val top = df.agg(TopKWeighted(col("k"), col("w"), 3, 20).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.key"), col("e.weight"))
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 7L), ("b", 3L)))
    // a double weight would truncate silently — must fail analysis
    val dbl = Seq(("a", 2.9)).toDF("k", "w")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      dbl.agg(TopKWeighted(col("k"), col("w"), 3, 20)).collect()
    }
    // swapped arguments must fail analysis, not stringify the key
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.agg(TopKWeighted(col("w"), col("k"), 3, 20)).collect()
    }
  }

  test("null keys and weights are ignored") {
    val df = Seq(
      (Some("a"), Some(5L)), (None, Some(9L)), (Some("a"), None),
      (Some("b"), Some(3L))).toDF("k", "w")
    val top = df.agg(TopKWeighted(col("k"), col("w"), 3, 20).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.key"), col("e.weight"))
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 5L), ("b", 3L)))
  }
}
