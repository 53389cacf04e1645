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
    val newest = main.newestHint.flatMap(_()).orElse {
      val r = main.df().agg(max(col("TimeReceived"))).collect()(0)
      if (r.isNullAt(0)) None else Some(r.getTimestamp(0))
    }
    newest.map(t => new Timestamp(t.getTime + 1000))
      .getOrElse(new Timestamp(0))
  }

  /** `GET /widget/top/{name}`: top-5 percent-of-total over the last 5
    * minutes before `now`, optional external-boundary filter
    * (reference `widgets.go:139-248`).
    */
  def top(spark: SparkSession, now: Timestamp, dimension: String,
      externalOnly: Boolean = false, limit: Int = 5): DataFrame = {
    val from = new Timestamp(now.getTime - 5 * 60 * 1000)
    val scan0 = main.scan(from, now)
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

  /** `GET /widget/top/{name}` with the reference's widget dispatch
    * (`widgets.go:139-248`): per-widget selector rendering (dictionary
    * labels for AS/protocol/port, EType if-chain), boundary filter from
    * the src-/dst- prefix, table routing at 5 points over the last 5
    * minutes, percent of a scalar total, empty names → "Unknown".
    * Dictionary joins run on the aggregated (bounded) result, not the
    * scan.
    */
  def topWidget(spark: SparkSession, now: Timestamp, widget: String,
      asns: Option[DataFrame] = None, limit: Int = 5): DataFrame = {
    val sp = spark
    import sp.implicits._
    val protoDict = graft.functions.Dictionaries.protocolNames.toSeq.sorted
      .toDF("p_proto", "proto_name")
    val from = new Timestamp(now.getTime - 5 * 60 * 1000)
    val mainRequired = widget == "src-port" || widget == "dst-port"
    val resolved = TableResolver.resolve(tables, from, now, 5, mainRequired)
    val scan0 = resolved.table.scan(from, now)
      .where(col("TimeReceived") >= lit(from) && col("TimeReceived") < lit(now))
    val scan =
      if (widget.startsWith("src-")) scan0.where(col("InIfBoundary") === "external")
      else if (widget.startsWith("dst-")) scan0.where(col("OutIfBoundary") === "external")
      else scan0
    val groupCols: Seq[String] = widget match {
      case "src-as" => Seq("SrcAS")
      case "dst-as" => Seq("DstAS")
      case "src-country" => Seq("SrcCountry")
      case "dst-country" => Seq("DstCountry")
      case "exporter" => Seq("ExporterName")
      case "protocol" => Seq("Proto")
      case "etype" => Seq("EType")
      case "src-port" => Seq("Proto", "SrcPort")
      case "dst-port" => Seq("Proto", "DstPort")
      case other => throw new IllegalArgumentException(s"unknown widget $other")
    }
    val per = scan.groupBy(groupCols.map(col): _*)
      .agg(sum(col("Bytes") * col("SamplingRate")).as("b"))
    val withDicts = widget match {
      case "src-as" | "dst-as" =>
        val dict = asns.getOrElse(Seq.empty[(Long, String)].toDF("asn", "asn_name"))
        per.join(broadcast(dict), col(groupCols.head) === col("asn"), "left")
          .withColumn("name", concat(col(groupCols.head).cast("string"),
            lit(": "), coalesce(col("asn_name"), lit("???"))))
      case "protocol" =>
        per.join(broadcast(protoDict), col("Proto") === col("p_proto"), "left")
          .withColumn("name", coalesce(col("proto_name"), lit("???")))
      case "etype" =>
        per.withColumn("name",
          when(col("EType") === 0x86dd, "IPv6")
            .when(col("EType") === 0x800, "IPv4").otherwise("???"))
      case "src-port" | "dst-port" =>
        per.join(broadcast(protoDict), col("Proto") === col("p_proto"), "left")
          .withColumn("name", concat(coalesce(col("proto_name"), lit("???")),
            lit("/"), col(groupCols(1)).cast("string")))
      case _ =>
        per.withColumn("name", col(groupCols.head).cast("string"))
    }
    val total = per.agg(sum("b").as("total"))
    withDicts.crossJoin(broadcast(total))
      .select(
        // NULL names (null group value, or a concat over a null AS) map
        // to "Unknown" exactly like empties — the reference never emits
        // a null name
        when(col("name").isNull || length(col("name")) === 0, "Unknown")
          .otherwise(col("name")).as("name"),
        (col("b") * 100.0 / col("total")).as("percent"))
      .orderBy(desc("percent"), asc("name"))
      .limit(limit)
  }

  /** `GET /widget/flow-rate`: COUNT(*)/300 over the last 5 minutes
    * (reference `widgets.go:95`).
    */
  def flowRate(spark: SparkSession, now: Timestamp): DataFrame = {
    val from = new Timestamp(now.getTime - 5 * 60 * 1000)
    main.scan(from, now)
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

  /** `GET /widget/flow-last` (reference `widgets.go:20-60`): the newest
    * flow row with columns that are unreadable as stored replaced by
    * display renders — the SELECT * EXCEPT/REPLACE shape (P13). Here the
    * binary addresses and community arrays get rendered; everything else
    * passes through.
    */
  def flowLast(spark: SparkSession, now: Timestamp): DataFrame = {
    import graft.functions.{Ip, Render}
    val renders: Map[String, org.apache.spark.sql.Column => org.apache.spark.sql.Column] = Map(
      "ExporterAddress" -> (c => Ip.ipToString(c)),
      "SrcAddr" -> (c => Ip.ipToString(c)),
      "DstAddr" -> (c => Ip.ipToString(c)),
      "SrcCommunities" -> (c => Render.communities(c)),
      "DstCommunities" -> (c => Render.communities(c)),
      "SrcMAC" -> (c => Render.mac(c)),
      "DstMAC" -> (c => Render.mac(c)),
      "SrcLargeCommunities" ->
        (c => array_join(transform(c, x => Render.largeCommunity(x)), " ")),
      "DstLargeCommunities" ->
        (c => array_join(transform(c, x => Render.largeCommunity(x)), " ")))
    // one pass: top-1 by TimeReceived (same newest-row semantics as the
    // reference's MAX-scalar subquery + LIMIT 1, without the extra jobs)
    val df = main.df().where(col("TimeReceived") < lit(now))
      .orderBy(desc("TimeReceived")).limit(1)
    renders.foldLeft(df) { case (d, (name, f)) =>
      if (d.columns.contains(name)) d.withColumn(name, f(col(name))) else d
    }
  }

  /** `GET /widget/exporters` (reference `widgets.go:111-135`): the sorted
    * distinct exporter list.
    */
  def exporterList(spark: SparkSession): DataFrame =
    main.df().select("ExporterName").distinct().orderBy("ExporterName")
}
