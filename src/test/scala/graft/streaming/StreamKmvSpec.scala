package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec
import graft.operators.sketch.Kmv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamKmvSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  test("windowed sketches refresh per batch and converge to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, String)]
    val q = StreamKmv.estimates(
        mem.toDF().toDF("ts", "g0", "v"), "g0", "v", "ts", k = 4,
        windowSec = 60L)
      .writeStream.format("memory").queryName("skmv")
      .outputMode("append").start()

    // batch 1: two distinct values in one window → exact count 2
    mem.addData((ts("2024-03-01T00:00:10Z"), "a", "v1"),
      (ts("2024-03-01T00:00:20Z"), "a", "v2"))
    q.processAllAvailable()
    val first = spark.table("skmv")
      .orderBy(desc("n_kept")).head()
    assert(first.getAs[Int]("n_kept") == 2 &&
      first.getAs[Long]("est_distinct") == 2L)

    // batch 2: one repeat + six fresh values → the same window's sketch
    // refreshes incrementally into the estimator regime (n_kept == k)
    mem.addData(
      (ts("2024-03-01T00:00:30Z"), "a", "v2"),
      (ts("2024-03-01T00:00:31Z"), "a", "v3"),
      (ts("2024-03-01T00:00:32Z"), "a", "v4"),
      (ts("2024-03-01T00:00:33Z"), "a", "v5"),
      (ts("2024-03-01T00:00:34Z"), "a", "v6"),
      (ts("2024-03-01T00:00:35Z"), "a", "v7"),
      (ts("2024-03-01T00:00:36Z"), "a", "v8"))
    q.processAllAvailable()
    q.stop()

    // the LAST emitted row for the window is the converged sketch; it
    // must equal the batch sketch of the union of both batches' values
    val streamed = spark.table("skmv").where(col("n_kept") === 4)
      .orderBy(desc("est_distinct")).collect()
    assert(streamed.nonEmpty, "estimator-regime refresh never emitted")
    val batch = Kmv.estimate(
      Kmv.sketch((1 to 8).map(i => ("a", s"v$i")).toDF("g0", "v"),
        "g0", "v", k = 4), k = 4).head()
    assert(streamed.map(_.getAs[Long]("est_distinct"))
      .contains(batch.getLong(2)),
      s"stream must converge to the batch estimate ${batch.getLong(2)}")
  }

  test("window state expires once the watermark passes its horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, String)]
    val q = StreamKmv.estimates(
        mem.toDF().toDF("ts", "g0", "v"), "g0", "v", "ts", k = 4,
        windowSec = 60L, watermark = "1 minute", horizonMs = 60000L)
      .writeStream.format("memory").queryName("skmv_exp")
      .outputMode("append").start()
    mem.addData((ts("2024-03-01T00:00:10Z"), "a", "v1"))
    q.processAllAvailable()
    // far-future rows push the watermark hours past the first window
    mem.addData((ts("2024-03-01T09:00:00Z"), "a", "w1"))
    q.processAllAvailable()
    mem.addData((ts("2024-03-01T09:00:01Z"), "a", "w2"))
    q.processAllAvailable()
    val total = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    // only the live window's state remains after the timeout fired
    assert(total == 1L, s"expired window state still resident: $total")
  }
}
