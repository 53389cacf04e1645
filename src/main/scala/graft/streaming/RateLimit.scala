package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-exporter flow rate limiting with sampling-rate compensation
  * (SURVEY §2.8 I4; reference `outlet/core/worker.go:78-99` +
  * `outlet/core/rate.go:37-63`): when an exporter exceeds its flow budget,
  * excess flows are dropped and the survivors' `SamplingRate` is inflated
  * by `1/(1 − dropRate)` so downstream byte/packet *estimates*
  * (`value × SamplingRate`) stay unbiased.
  *
  * Batch determinism: the reference compensates a tick with the drop rate
  * of the *previous* wall-clock tick (an online estimator — the current
  * tick's total is unknowable mid-stream). A batch engine sees whole ticks,
  * so the Spark shape compensates each tick with its own exact ratio
  * `total/kept` — the same correction without the one-tick lag — and keeps
  * the *first* `limit` flows per tick in (time, tiebreak) order rather than
  * a racy token bucket, making the operator deterministic and
  * oracle-checkable.
  *
  * Scale: one hash shuffle on (exporter, tick) — the natural partitioning
  * key of the ingest path; both window functions share it. At 100 TB the
  * per-partition state is a row-number counter, nothing accumulates.
  */
object RateLimit {

  /** Keep at most `limit` flows per exporter per `tickSec` window,
    * compensating survivors' `rateCol` by `total/kept` (integer floor —
    * both engines divide non-negatives identically).
    *
    * @param exporterCol exporter identity column
    * @param tsCol       epoch-seconds column (long)
    * @param tiebreak    deterministic within-tick order after time
    */
  def apply(df: DataFrame, limit: Long, tickSec: Long,
      exporterCol: Column, tsCol: Column, rateCol: String,
      tiebreak: Seq[Column]): DataFrame = {
    // the helper columns would silently clobber same-named input columns
    val reserved = Seq("__tick", "__rn", "__total", "__kept")
    require(!df.columns.exists(reserved.contains),
      s"RateLimit reserves columns ${reserved.mkString(", ")}")
    // materialize the tick once so both windows partition on the SAME
    // attribute — distinct expression instances would each plan their own
    // exchange; one attribute means one shuffle serves count and rank
    val w = Window.partitionBy(exporterCol, col("__tick"))
    val ordered = w.orderBy((tsCol +: tiebreak).toIndexedSeq: _*)
    df.withColumn("__tick", (tsCol / tickSec).cast("long"))
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__total", count(lit(1)).over(w))
      .where(col("__rn") <= limit)
      .withColumn("__kept", least(col("__total"), lit(limit)))
      .withColumn(rateCol,
        // kept = min(total, limit); SQL `div` is exact long division, so
        // rate*total beyond 2^53 still matches DuckDB's integer `//`
        // (a double-rounded floor(×/÷) would not)
        expr(s"`$rateCol` * __total div __kept"))
      .drop("__rn", "__total", "__tick", "__kept")
  }
}
