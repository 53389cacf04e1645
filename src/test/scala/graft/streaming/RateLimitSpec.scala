package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** I4 rate limiting: drops are deterministic and the compensated
  * SamplingRate preserves flow/byte estimates (reference
  * `outlet/core/worker.go:95-99` — `rate / (1 − dropRate)`).
  */
class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  private def flows(exporter: String, tick0: Long, n: Int, rate: Long) =
    (0 until n).map(i => (exporter, tick0 + i % 10, i.toLong, 100L + i, rate))

  test("over-limit exporters drop flows; under-limit pass untouched") {
    val df = (flows("exp0", 1000L, 20, 1000L) ++ flows("exp1", 1000L, 3, 500L))
      .toDF("exporter", "es", "seq", "bytes", "rate")
    val out = RateLimit(df, limit = 5L, tickSec = 60L,
      col("exporter"), col("es"), "rate", Seq(col("seq")))
    val byExp = out.groupBy("exporter")
      .agg(count(lit(1)).as("n"), sum("rate").as("est"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exp0: 20 flows in one tick → 5 kept at rate 1000·20/5 = 4000 each;
    // the flow estimate 5 × 4000 = 20 × 1000 is exactly preserved
    assert(byExp("exp0") == (5L, 20000L))
    // exp1 under the limit: untouched rows, untouched rate
    assert(byExp("exp1") == (3L, 1500L))
  }

  test("kept flows are the first by (time, tiebreak)") {
    val df = Seq(("e", 1001L, 9L, 1L, 100L), ("e", 1000L, 5L, 2L, 100L),
      ("e", 1000L, 1L, 3L, 100L), ("e", 1002L, 0L, 4L, 100L))
      .toDF("exporter", "es", "seq", "bytes", "rate")
    val kept = RateLimit(df, limit = 2L, tickSec = 60L,
      col("exporter"), col("es"), "rate", Seq(col("seq")))
      .select("bytes").as[Long].collect().toSet
    assert(kept == Set(3L, 2L)) // es=1000 seq 1, then es=1000 seq 5
  }

  test("byte estimate is unbiased when traffic is uniform per tick") {
    // equal-sized flows: byte estimate preserved exactly, not just the
    // flow-count estimate
    val df = (0 until 12).map(i => ("e", 1000L, i.toLong, 700L, 1000L))
      .toDF("exporter", "es", "seq", "bytes", "rate")
    val out = RateLimit(df, limit = 4L, tickSec = 60L,
      col("exporter"), col("es"), "rate", Seq(col("seq")))
    val est = out.select(sum(col("bytes") * col("rate"))).as[Long].head()
    assert(est == 12L * 700L * 1000L)
  }

  test("compensation is exact past the double-precision boundary") {
    // rate·total = 9.303e15 > 2^53, chosen so floor(double(rate·total)/kept)
    // is off by one from exact integer division (verified numerically):
    // the SQL DIV path must produce the exact quotient, which is also what
    // the DuckDB oracle's integer `//` computes.
    val rate = 3_100_000_001_999L
    val df = (0 until 3001).map(i => ("e", 1000L, i.toLong, rate))
      .toDF("exporter", "es", "seq", "rate")
    val out = RateLimit(df, limit = 3000L, tickSec = 60L,
      col("exporter"), col("es"), "rate", Seq(col("seq")))
    val kept = out.select("rate").as[Long].collect()
    assert(kept.length == 3000)
    val exact = (BigInt(rate) * 3001 / 3000).toLong
    val viaDouble = math.floor((rate * 3001L).toDouble / 3000L).toLong
    assert(exact != viaDouble, "test values must discriminate the two paths")
    assert(kept.toSet == Set(exact), s"got ${kept.toSet}, want $exact")
  }
}
