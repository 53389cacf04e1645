package graft.queryengine

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schema

/** Console widgets (reference `console/widgets.go`). */
final class Widgets(schema: Schema, tables: Seq[FlowTable]) {

  private def main: FlowTable =
    tables.find(_.resolutionSec == 0L)
      .getOrElse(throw new IllegalArgumentException("no main table"))

  /** "Now" derived from the data: MAX(TimeReceived) scalar subquery
    * (reference `widgets.go:53-56` anchors the last-5-minutes windows on
    * the newest flow, not the wall clock). Returned one second past the
    * newest flow so the engine's half-open windows include it (the
    * reference's form has no upper bound at all).
    */
  def dataNow(): Timestamp = {
    val r = main.df().agg(max(col("TimeReceived"))).collect()(0)
    if (r.isNullAt(0)) new Timestamp(0)
    else new Timestamp(r.getTimestamp(0).getTime + 1000)
  }

  /** `GET /widget/top/{name}`: top-5 percent-of-total over the last 5
    * minutes before `now`, optional external-boundary filter
    * (reference `widgets.go:139-248`).
    */
  def top(spark: SparkSession, now: Timestamp, dimension: String,
      externalOnly: Boolean = false, limit: Int = 5): DataFrame = {
    val from = new Timestamp(now.getTime - 5 * 60 * 1000)
    val scan0 = main.df()
      .where(col("TimeReceived") >= lit(from) && col("TimeReceived") < lit(now))
    val scan = if (externalOnly) scan0.where(col("InIfBoundary") === "external")
      else scan0
    val per = scan.groupBy(col(dimension))
      .agg(sum(col("Bytes") * col("SamplingRate")).as("b"))
    val total = per.agg(sum("b").as("total"))
    per.crossJoin(broadcast(total))
      .select(col(dimension).as("name"),
        (col("b") * 100.0 / col("total")).as("percent"))
      .orderBy(desc("percent"), asc("name"))
      .limit(limit)
  }

  /** `GET /widget/flow-rate`: COUNT(*)/300 over the last 5 minutes
    * (reference `widgets.go:95`).
    */
  def flowRate(spark: SparkSession, now: Timestamp): DataFrame = {
    val from = new Timestamp(now.getTime - 5 * 60 * 1000)
    main.df()
      .where(col("TimeReceived") >= lit(from) && col("TimeReceived") < lit(now))
      .agg((count(lit(1)) / 300.0).as("rate"))
  }

  /** `GET /widget/graph`: single-series gap-filled Gbps over the period
    * (reference `widgets.go:250-292`).
    */
  def graph(spark: SparkSession, start: Timestamp, end: Timestamp,
      points: Int): DataFrame = {
    val line = new LineQuery(schema, tables)
    line.build(spark, LineInput(start, end, points, dimensions = Nil,
      limit = 1, unit = "l3bps"))
      .select(col("time_s"), (col("xps") / 1e9).as("gbps"))
  }
}
