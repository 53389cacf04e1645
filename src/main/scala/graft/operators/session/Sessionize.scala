package graft.operators.session

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions at
  * inactivity gaps, entirely with window functions.
  *
  * Scale shape: ONE shuffle keyed by the user column; both windows (the
  * lag and the running session counter) share that partitioning, so
  * Catalyst plans a single exchange + sort and every user sessionizes in
  * parallel. No state store, no driver loop — at 100 TB the cost is the
  * one sort per user partition. Ties on the timestamp are broken by the
  * event id so the session boundaries are deterministic and an SQL oracle
  * reproduces them exactly.
  *
  * (The streaming twin of this batch operator is
  * `flatMapGroupsWithState` with event-time timeouts; the batch window
  * form is the backfill/replay path.)
  */
object Sessionize {

  /** Tag every event with its user's `session_idx` (1-based, in time
    * order): a new session starts when the gap to the user's previous
    * event exceeds `gapSec` (strictly greater). Both the ordering and the
    * gap are measured in whole epoch seconds — sub-second timestamp
    * precision is deliberately ignored so the boundaries are identical in
    * any engine that truncates timestamps to seconds.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame = {
    val es = unix_timestamp(col(tsCol))
    val ord = Window.partitionBy(userCol).orderBy(es, col(tieCol))
    val newSession =
      when(lag(es, 1).over(ord).isNull ||
        es - lag(es, 1).over(ord) > gapSec, 1L)
        .otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session rollup: event count, start/end epoch seconds, duration. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame = {
    val es = unix_timestamp(col(tsCol))
    sessionize(df, userCol, tsCol, tieCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(es).as("start_s"), max(es).as("end_s"))
      .withColumn("duration_s", col("end_s") - col("start_s"))
  }
}
