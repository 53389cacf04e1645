package graft.queries

import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queryengine._
import graft.schema.FlowSchema
import graft.store.EventFlows
import graft.filter.FilterCompiler

/** Driver-facing queries exercising the akvorado query engine end-to-end:
  * filter DSL → table routing (rollups) → top-N → Other folding → aligned
  * buckets → gap fill → axis unions. Oracles replicate the whole pipeline
  * in DuckDB SQL over the same `events` mapping.
  *
  * Double-valued engine outputs (xps, weights, percents) are converted back
  * to exact integers in the wrappers (xps*interval = the original integer
  * sum) so cross-engine comparison is bit-safe.
  */
object Flow {
  type Q = (SparkSession, String) => DataFrame

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  /** DuckDB CASE for the shared protocol dictionary, so widget oracles use
    * the exact map the engine does (`Dictionaries.protocolNames`).
    */
  private val protoCaseSql: String =
    graft.functions.Dictionaries.protocolNames.toSeq.sorted
      .map { case (n, name) => s"WHEN $n THEN '$name'" }
      .mkString("CASE Proto ", " ", " END")

  private val schema = FlowSchema.schema

  private def engine(s: SparkSession, dir: String) =
    (new LineQuery(schema, EventFlows.tables(s, dir)),
      new SankeyQuery(schema, EventFlows.tables(s, dir)),
      new Widgets(schema, EventFlows.tables(s, dir)))

  // Flagship: 28 days, 1-day buckets, top-2 interfaces + Other, TCP external.
  val qLine: Q = (s, dir) => {
    val (line, _, _) = engine(s, dir)
    line.build(s, LineInput(
      start = ts("2024-01-01T00:00:00Z"), end = ts("2024-01-29T00:00:00Z"),
      points = 28, dimensions = Seq("InIfName"), limit = 2,
      filter = "InIfBoundary = external AND Proto = 'TCP'", unit = "l3bps"))
      .select(col("axis"), col("time_s"),
        array_join(col("dimensions"), ",").as("name"),
        round(col("xps") * 86400).cast("long").as("bps_sum"))
  }

  // Bidirectional + previous period: 4 axes.
  val qLineBidir: Q = (s, dir) => {
    val (line, _, _) = engine(s, dir)
    line.build(s, LineInput(
      start = ts("2024-01-08T00:00:00Z"), end = ts("2024-01-15T00:00:00Z"),
      points = 7, dimensions = Seq("ExporterName"), limit = 2,
      filter = "InIfBoundary = external", unit = "pps",
      bidirectional = true, previousPeriod = true))
      .select(col("axis"), col("time_s"),
        array_join(col("dimensions"), ",").as("name"),
        round(col("xps") * 86400).cast("long").as("pps_sum"))
  }

  // Raw-table routing + topKWeighted sketch substitution: the SrcPort
  // filter is main-table-only, forcing the main table, where the "avg"
  // limit mode ranks via the SpaceSaving sketch (exact here: 4 interface
  // names ≪ capacity 2×20).
  val qLineRaw: Q = (s, dir) => {
    val (line, _, _) = engine(s, dir)
    line.build(s, LineInput(
      start = ts("2024-01-08T00:00:00Z"), end = ts("2024-01-15T00:00:00Z"),
      points = 7, dimensions = Seq("InIfName"), limit = 2,
      filter = "SrcPort >= 1024", unit = "pps"))
      .select(col("axis"), col("time_s"),
        array_join(col("dimensions"), ",").as("name"),
        round(col("xps") * 86400).cast("long").as("pps_sum"))
  }

  // P1 AS-number labeling: SrcAS dimension renders "num: name" through
  // the asns dictionary with '???' on miss.
  val qLineAs: Q = (s, dir) => {
    val schemaWithDict = FlowSchema.schema.withAsnNames(
      Map(64496L -> "AS-ZERO", 64497L -> "AS-ONE"))
    val line = new LineQuery(schemaWithDict, EventFlows.tables(s, dir))
    line.build(s, LineInput(
      start = ts("2024-01-08T00:00:00Z"), end = ts("2024-01-15T00:00:00Z"),
      points = 7, dimensions = Seq("SrcAS"), limit = 3, unit = "pps"))
      .select(col("axis"), col("time_s"),
        array_join(col("dimensions"), ",").as("name"),
        round(col("xps") * 86400).cast("long").as("pps_sum"))
  }

  // IP dimension + truncation: SrcAddr (main-only, binary) is truncated to
  // /24 by the source REPLACE and rendered dotted by the schema renderer.
  val qLineIp: Q = (s, dir) => {
    val (line, _, _) = engine(s, dir)
    line.build(s, LineInput(
      start = ts("2024-01-08T00:00:00Z"), end = ts("2024-01-15T00:00:00Z"),
      points = 7, dimensions = Seq("SrcAddr"), limit = 3,
      unit = "pps", truncateV4 = 24))
      .select(col("axis"), col("time_s"),
        array_join(col("dimensions"), ",").as("name"),
        round(col("xps") * 86400).cast("long").as("pps_sum"))
  }

  val qSankey: Q = (s, dir) => {
    val (_, sankey, _) = engine(s, dir)
    sankey.build(s, SankeyInput(
      start = ts("2024-01-01T00:00:00Z"), end = ts("2024-01-29T00:00:00Z"),
      dimensions = Seq("SrcCountry", "DstCountry"), limit = 5, unit = "pps"))
      .withColumn("w_sum", round(col("weight") * col("span_sec")).cast("long"))
      .drop("weight", "span_sec")
  }

  // Bidirectional sankey: reversed columns probe the direct axis's top
  // sets positionally, merged with an axis literal.
  val qSankeyBidir: Q = (s, dir) => {
    val (_, sankey, _) = engine(s, dir)
    sankey.build(s, SankeyInput(
      start = ts("2024-01-01T00:00:00Z"), end = ts("2024-01-29T00:00:00Z"),
      dimensions = Seq("SrcCountry", "DstCountry"), limit = 5, unit = "pps",
      bidirectional = true))
      .withColumn("w_sum", round(col("weight") * col("span_sec")).cast("long"))
      .drop("weight", "span_sec")
  }

  val qWidgetTop: Q = (s, dir) => {
    val (_, _, widgets) = engine(s, dir)
    widgets.top(s, ts("2024-01-29T00:00:00Z"), "SrcAS", externalOnly = true)
      .select(col("name"), floor(col("percent") * 10000).cast("long").as("pct_bp"))
  }

  // Widget dispatch: protocol widget (dictionary label, no boundary
  // filter) and dst-port widget (proto/port concat, OutIfBoundary filter,
  // main table required).
  val qWidgetProto: Q = (s, dir) => {
    val (_, _, widgets) = engine(s, dir)
    widgets.topWidget(s, ts("2024-01-29T00:00:00Z"), "protocol")
      .select(col("name"), floor(col("percent") * 10000).cast("long").as("pct_bp"))
  }

  val qWidgetDstPort: Q = (s, dir) => {
    val (_, _, widgets) = engine(s, dir)
    // `now` sits where the preceding 5 minutes contain external-boundary
    // rows at every gate SF — the corpus-end window is empty at sf0.01
    // and a 0-row == 0-row match would verify nothing about the widget
    widgets.topWidget(s, ts("2024-01-01T02:50:00Z"), "dst-port")
      .select(col("name"), floor(col("percent") * 10000).cast("long").as("pct_bp"))
  }

  val qWidgetRate: Q = (s, dir) => {
    val (_, _, widgets) = engine(s, dir)
    widgets.flowRate(s, ts("2024-01-29T00:00:00Z"))
      .select(round(col("rate") * 300).cast("long").as("flows"))
  }

  // J8: arrayJoin/explode of the communities array for completion
  // frequency counting (reference `console/filter.go:250-258`), rendered
  // a:b (P5).
  val qCommunityFreq: Q = (s, dir) => {
    EventFlows.flows(s, dir)
      .select(explode(col("DstCommunities")).as("c"))
      .select(graft.functions.Render.community(col("c")).as("community"))
      .groupBy("community")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("community"))
      .limit(10)
  }

  // Filter DSL compiled to a predicate, normal direction.
  val qFilterDsl: Q = (s, dir) => {
    val flows = EventFlows.flows(s, dir)
    val cf = FilterCompiler.compile(schema,
      // 'JP' in the list keeps the REVERSE direction non-empty: only
      // DstPort 8080 clears the port bound and those rows are always
      // DstCountry=JP in the synthetic flows — with ('US','FR') the
      // reverse query verified an empty result against an empty oracle
      "SrcCountry IN ('US', 'JP') AND SrcPort >= 3000 AND NOT (Proto = 'UDP')" +
        " AND ExporterName LIKE 'exp%'")
      .fold(e => throw e, identity)
    flows.where(cf.predicate)
      .groupBy("SrcCountry")
      .agg(count(lit(1)).as("n"), sum("Bytes").as("bytes"))
  }

  // Same filter, reverse direction (Src↔Dst / In↔Out swapped).
  val qFilterDslRev: Q = (s, dir) => {
    val flows = EventFlows.flows(s, dir)
    val cf = FilterCompiler.compile(schema,
      // 'JP' in the list keeps the REVERSE direction non-empty: only
      // DstPort 8080 clears the port bound and those rows are always
      // DstCountry=JP in the synthetic flows — with ('US','FR') the
      // reverse query verified an empty result against an empty oracle
      "SrcCountry IN ('US', 'JP') AND SrcPort >= 3000 AND NOT (Proto = 'UDP')" +
        " AND ExporterName LIKE 'exp%'")
      .fold(e => throw e, identity)
    flows.where(cf.reversePredicate)
      .groupBy("DstCountry")
      .agg(count(lit(1)).as("n"), sum("Bytes").as("bytes"))
  }

  private val F = EventFlows.flowsSql

  // --- destination-port diversity per exporter (scan-detection signal):
  // Gini impurity of the port distribution, exact integer ppm (the
  // entropy-style concentration measure, kept rational so engines agree
  // bit-for-bit; substitute -Σp·ln p when exactness is not required).
  // Two-level aggregation — both shuffles carry counts, never rows.
  val qPortDiversity: Q = (s, dir) => {
    EventFlows.flows(s, dir)
      .groupBy(col("ExporterName"), col("DstPort"))
      .agg(count(lit(1)).as("c"))
      .groupBy("ExporterName")
      .agg(sum("c").as("n_flows"), count(lit(1)).as("n_ports"),
        sum(col("c") * col("c")).as("sumsq"))
      .select(col("ExporterName"), col("n_flows"), col("n_ports"),
        expr("(n_flows * n_flows - sumsq) * 1000000 div (n_flows * n_flows)")
          .as("gini_ppm"))
  }

  // --- hourly traffic anomaly score per exporter: hours whose flow count
  // exceeds 1.5× that exporter's median hourly count. Two aggregations
  // (hour counts reduce map-side; medians are per-exporter over ≤ hours
  // rows) and a broadcast-sized join back — no window over the fact rows.
  val qAnomalyHours: Q = (s, dir) => {
    val hourly = EventFlows.flows(s, dir)
      .groupBy(col("ExporterName"),
        (expr("CAST(unix_timestamp(TimeReceived) AS BIGINT) div 3600") * 3600)
          .as("hour_s"))
      .agg(count(lit(1)).as("n"))
    val med = hourly.groupBy("ExporterName")
      .agg(expr("percentile(n, 0.5D)").as("med"))
    hourly.join(med, Seq("ExporterName"))
      .withColumn("ratio_pm", round(col("n") * 1000 / col("med")).cast("long"))
      .where(col("ratio_pm") >= 1500)
      .select(col("ExporterName"), col("hour_s"), col("n"), col("ratio_pm"))
  }

  val defs: Map[String, Q] = Map(
    "q_anomaly_hours" -> qAnomalyHours,
    "q_port_diversity" -> qPortDiversity,
    "q_line" -> qLine,
    "q_line_raw" -> qLineRaw,
    "q_line_ip" -> qLineIp,
    "q_line_as" -> qLineAs,
    "q_line_bidir" -> qLineBidir,
    "q_sankey" -> qSankey,
    "q_sankey_bidir" -> qSankeyBidir,
    "q_widget_top" -> qWidgetTop,
    "q_widget_proto" -> qWidgetProto,
    "q_widget_dstport" -> qWidgetDstPort,
    "q_widget_rate" -> qWidgetRate,
    "q_community_freq" -> qCommunityFreq,
    "q_filter_dsl" -> qFilterDsl,
    "q_filter_dsl_rev" -> qFilterDslRev
  )

  val oracles: Map[String, String] = Map(
    "q_anomaly_hours" ->
      s"""WITH flows AS ($F),
         |hourly AS (SELECT ExporterName,
         |    CAST(epoch(date_trunc('second', TimeReceived)) AS BIGINT)
         |      // 3600 * 3600 AS hour_s,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM flows GROUP BY 1, 2),
         |med AS (SELECT ExporterName, quantile_cont(n, 0.5) AS med
         |  FROM hourly GROUP BY 1)
         |SELECT ExporterName, hour_s, n,
         |  CAST(round(n * 1000 / med) AS BIGINT) AS ratio_pm
         |FROM hourly JOIN med USING (ExporterName)
         |WHERE round(n * 1000 / med) >= 1500""".stripMargin,
    "q_port_diversity" ->
      s"""WITH flows AS ($F),
         |per AS (SELECT ExporterName, DstPort, count(*) AS c
         |  FROM flows GROUP BY 1, 2),
         |agg AS (SELECT ExporterName, sum(c) AS n_flows, count(*) AS n_ports,
         |    sum(c*c) AS sumsq
         |  FROM per GROUP BY 1)
         |SELECT ExporterName, CAST(n_flows AS BIGINT) AS n_flows,
         |  CAST(n_ports AS BIGINT) AS n_ports,
         |  CAST((n_flows*n_flows - sumsq) * 1000000 // (n_flows*n_flows)
         |    AS BIGINT) AS gini_ppm
         |FROM agg""".stripMargin,
    "q_line" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT * FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-01 00:00:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-29 00:00:00'
         |    AND InIfBoundary = 'external' AND Proto = 6),
         |top AS (SELECT InIfName FROM f GROUP BY 1
         |  ORDER BY sum(Bytes*SamplingRate*8) DESC, InIfName LIMIT 2),
         |folded AS (SELECT
         |  1704067200 + (CAST(epoch(TimeReceived) AS BIGINT) - 1704067200) // 86400 * 86400 AS time_s,
         |  CASE WHEN InIfName IN (SELECT InIfName FROM top) THEN InIfName
         |       ELSE 'Other' END AS name,
         |  Bytes*SamplingRate*8 AS w FROM f),
         |per AS (SELECT time_s, name, CAST(sum(w) AS BIGINT) AS bps_sum
         |  FROM folded GROUP BY 1, 2),
         |cal AS (SELECT unnest(range(1704067200, 1704067200 + 28*86400, 86400)) AS time_s)
         |SELECT 1 AS axis, time_s, name, bps_sum FROM per
         |UNION ALL
         |SELECT 1 AS axis, c.time_s, 'Other' AS name, 0 AS bps_sum FROM cal c
         |WHERE c.time_s NOT IN (SELECT time_s FROM per)""".stripMargin,
    "q_line_raw" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT * FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-08 00:00:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-15 00:00:00'
         |    AND SrcPort >= 1024),
         |top AS (SELECT InIfName FROM f GROUP BY 1
         |  ORDER BY sum(Packets*SamplingRate) DESC, InIfName LIMIT 2),
         |folded AS (SELECT
         |  1704672000 + (CAST(epoch(TimeReceived) AS BIGINT) - 1704672000) // 86400 * 86400 AS time_s,
         |  CASE WHEN InIfName IN (SELECT InIfName FROM top) THEN InIfName
         |       ELSE 'Other' END AS name,
         |  Packets*SamplingRate AS w FROM f),
         |per AS (SELECT time_s, name, CAST(sum(w) AS BIGINT) AS pps_sum
         |  FROM folded GROUP BY 1, 2),
         |cal AS (SELECT unnest(range(1704672000, 1704672000 + 7*86400, 86400)) AS time_s)
         |SELECT 1 AS axis, time_s, name, pps_sum FROM per
         |UNION ALL
         |SELECT 1 AS axis, c.time_s, 'Other' AS name, 0 AS pps_sum FROM cal c
         |WHERE c.time_s NOT IN (SELECT time_s FROM per)""".stripMargin,
    "q_line_as" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT date_trunc('day', TimeReceived) AS TimeReceived, SrcAS,
         |    Packets, SamplingRate FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-08 00:00:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-15 00:00:00'),
         |lab AS (SELECT CAST(SrcAS AS VARCHAR) || ': ' ||
         |    coalesce(CASE SrcAS WHEN 64496 THEN 'AS-ZERO'
         |      WHEN 64497 THEN 'AS-ONE' END, '???') AS name0,
         |  TimeReceived, Packets*SamplingRate AS w FROM f),
         |top AS (SELECT name0 FROM lab GROUP BY 1
         |  ORDER BY sum(w) DESC, name0 LIMIT 3),
         |folded AS (SELECT
         |  1704672000 + (CAST(epoch(TimeReceived) AS BIGINT) - 1704672000) // 86400 * 86400 AS time_s,
         |  CASE WHEN name0 IN (SELECT name0 FROM top) THEN name0
         |       ELSE 'Other' END AS name,
         |  w FROM lab),
         |per AS (SELECT time_s, name, CAST(sum(w) AS BIGINT) AS pps_sum
         |  FROM folded GROUP BY 1, 2),
         |cal AS (SELECT unnest(range(1704672000, 1704672000 + 7*86400, 86400)) AS time_s)
         |SELECT 1 AS axis, time_s, name, pps_sum FROM per
         |UNION ALL
         |SELECT 1 AS axis, c.time_s, 'Other' AS name, 0 AS pps_sum FROM cal c
         |WHERE c.time_s NOT IN (SELECT time_s FROM per)""".stripMargin,
    "q_line_ip" ->
      """WITH f AS (SELECT ts AS TimeReceived,
        |  '10.0.' || CAST(user_id // 256 % 256 AS VARCHAR) || '.0' AS name0,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 + 1 AS Packets,
        |  1000 AS SamplingRate
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-15 00:00:00'),
        |top AS (SELECT name0 FROM f GROUP BY 1
        |  ORDER BY sum(Packets*SamplingRate) DESC, name0 LIMIT 3),
        |folded AS (SELECT
        |  1704672000 + (CAST(epoch(TimeReceived) AS BIGINT) - 1704672000) // 86400 * 86400 AS time_s,
        |  CASE WHEN name0 IN (SELECT name0 FROM top) THEN name0
        |       ELSE 'Other' END AS name,
        |  Packets*SamplingRate AS w FROM f),
        |per AS (SELECT time_s, name, CAST(sum(w) AS BIGINT) AS pps_sum
        |  FROM folded GROUP BY 1, 2),
        |cal AS (SELECT unnest(range(1704672000, 1704672000 + 7*86400, 86400)) AS time_s)
        |SELECT 1 AS axis, time_s, name, pps_sum FROM per
        |UNION ALL
        |SELECT 1 AS axis, c.time_s, 'Other' AS name, 0 AS pps_sum FROM cal c
        |WHERE c.time_s NOT IN (SELECT time_s FROM per)""".stripMargin,
    "q_line_bidir" -> {
      // 4 axes: direct, reverse, previous-direct, previous-reverse.
      // previous period for a 7-day range shifts back one week, and
      // previous axes are DIMENSIONLESS (reference strips dimensions).
      def axisNoDim(n: Int, boundaryCol: String, startS: Long,
          shift: Long): String =
        s"""SELECT $n AS axis, time_s + $shift AS time_s, '' AS name,
           |  CAST(sum(w) AS BIGINT) AS pps_sum FROM (
           |  SELECT $startS + (CAST(epoch(TimeReceived) AS BIGINT) - $startS) // 86400 * 86400 AS time_s,
           |    Packets*SamplingRate AS w
           |  FROM flows
           |  WHERE TimeReceived >= to_timestamp($startS)
           |    AND TimeReceived < to_timestamp(${startS + 7 * 86400})
           |    AND $boundaryCol = 'external') GROUP BY 1, 2, 3
           |UNION ALL
           |SELECT $n AS axis, c.time_s + $shift AS time_s, '' AS name, 0 AS pps_sum
           |FROM (SELECT unnest(range($startS, $startS + 7*86400, 86400)) AS time_s) c
           |WHERE c.time_s NOT IN (
           |  SELECT $startS + (CAST(epoch(TimeReceived) AS BIGINT) - $startS) // 86400 * 86400
           |  FROM flows WHERE TimeReceived >= to_timestamp($startS)
           |    AND TimeReceived < to_timestamp(${startS + 7 * 86400})
           |    AND $boundaryCol = 'external')""".stripMargin
      def axis(n: Int, nameCol: String, boundaryCol: String, startS: Long,
          shift: Long): String =
        s"""SELECT $n AS axis, time_s + $shift AS time_s, name,
           |  CAST(sum(w) AS BIGINT) AS pps_sum FROM (
           |  SELECT $startS + (CAST(epoch(TimeReceived) AS BIGINT) - $startS) // 86400 * 86400 AS time_s,
           |    CASE WHEN $nameCol IN (
           |      SELECT $nameCol FROM flows
           |      WHERE TimeReceived >= to_timestamp($startS)
           |        AND TimeReceived < to_timestamp(${startS + 7 * 86400})
           |        AND $boundaryCol = 'external'
           |      GROUP BY 1 ORDER BY sum(Packets*SamplingRate) DESC, $nameCol LIMIT 2)
           |      THEN $nameCol ELSE 'Other' END AS name,
           |    Packets*SamplingRate AS w
           |  FROM flows
           |  WHERE TimeReceived >= to_timestamp($startS)
           |    AND TimeReceived < to_timestamp(${startS + 7 * 86400})
           |    AND $boundaryCol = 'external') GROUP BY 1, 2, 3
           |UNION ALL
           |SELECT $n AS axis, c.time_s + $shift AS time_s, 'Other' AS name, 0 AS pps_sum
           |FROM (SELECT unnest(range($startS, $startS + 7*86400, 86400)) AS time_s) c
           |WHERE c.time_s NOT IN (
           |  SELECT $startS + (CAST(epoch(TimeReceived) AS BIGINT) - $startS) // 86400 * 86400
           |  FROM flows WHERE TimeReceived >= to_timestamp($startS)
           |    AND TimeReceived < to_timestamp(${startS + 7 * 86400})
           |    AND $boundaryCol = 'external')""".stripMargin
      val w2start = 1704067200L + 7 * 86400 // 2024-01-08
      val w1start = 1704067200L // 2024-01-01
      s"""WITH flows AS ($F)
         |${axis(1, "ExporterName", "InIfBoundary", w2start, 0)}
         |UNION ALL
         |${axis(2, "ExporterName", "OutIfBoundary", w2start, 0)}
         |UNION ALL
         |${axisNoDim(3, "InIfBoundary", w1start, 7 * 86400)}
         |UNION ALL
         |${axisNoDim(4, "OutIfBoundary", w1start, 7 * 86400)}""".stripMargin
    },
    "q_sankey" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT date_trunc('hour', TimeReceived) AS TimeReceived,
         |    SrcCountry, DstCountry, Packets, SamplingRate FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-01 00:00:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-29 00:00:00'),
         |top AS (SELECT SrcCountry, DstCountry FROM f GROUP BY 1, 2
         |  ORDER BY sum(Packets*SamplingRate) DESC, SrcCountry, DstCountry LIMIT 5),
         |folded AS (SELECT
         |  CASE WHEN SrcCountry IN (SELECT SrcCountry FROM top)
         |    THEN SrcCountry ELSE 'Other' END AS SrcCountry,
         |  CASE WHEN DstCountry IN (SELECT DstCountry FROM top)
         |    THEN DstCountry ELSE 'Other' END AS DstCountry,
         |  Packets*SamplingRate AS w FROM f)
         |SELECT SrcCountry, DstCountry, CAST(sum(w) AS BIGINT) AS w_sum
         |FROM folded GROUP BY 1, 2""".stripMargin,
    "q_sankey_bidir" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT date_trunc('hour', TimeReceived) AS TimeReceived,
         |    SrcCountry, DstCountry, Packets, SamplingRate FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-01 00:00:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-29 00:00:00'),
         |top AS (SELECT SrcCountry, DstCountry FROM f GROUP BY 1, 2
         |  ORDER BY sum(Packets*SamplingRate) DESC, SrcCountry, DstCountry LIMIT 5),
         |d AS (SELECT
         |  CASE WHEN SrcCountry IN (SELECT SrcCountry FROM top)
         |    THEN SrcCountry ELSE 'Other' END AS SrcCountry,
         |  CASE WHEN DstCountry IN (SELECT DstCountry FROM top)
         |    THEN DstCountry ELSE 'Other' END AS DstCountry,
         |  Packets*SamplingRate AS w FROM f),
         |r AS (SELECT
         |  CASE WHEN DstCountry IN (SELECT SrcCountry FROM top)
         |    THEN DstCountry ELSE 'Other' END AS SrcCountry,
         |  CASE WHEN SrcCountry IN (SELECT DstCountry FROM top)
         |    THEN SrcCountry ELSE 'Other' END AS DstCountry,
         |  Packets*SamplingRate AS w FROM f)
         |SELECT SrcCountry, DstCountry, 1 AS axis, CAST(sum(w) AS BIGINT) AS w_sum
         |FROM d GROUP BY 1, 2
         |UNION ALL
         |SELECT SrcCountry, DstCountry, 2 AS axis, CAST(sum(w) AS BIGINT) AS w_sum
         |FROM r GROUP BY 1, 2""".stripMargin,
    "q_widget_top" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT * FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-28 23:55:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-29 00:00:00'
         |    AND InIfBoundary = 'external'),
         |per AS (SELECT SrcAS AS name, CAST(sum(Bytes*SamplingRate) AS BIGINT) AS b
         |  FROM f GROUP BY 1)
         |SELECT name,
         |  CAST(floor(b * 100.0 / (SELECT sum(b) FROM per) * 10000) AS BIGINT) AS pct_bp
         |FROM per ORDER BY b * 100.0 / (SELECT sum(b) FROM per) DESC, name LIMIT 5""".stripMargin,
    "q_widget_proto" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT * FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-28 23:55:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-29 00:00:00'),
         |per AS (SELECT Proto, CAST(sum(Bytes*SamplingRate) AS BIGINT) AS b
         |  FROM f GROUP BY 1)
         |SELECT coalesce($protoCaseSql, '???') AS name,
         |  CAST(floor(b * 100.0 / (SELECT sum(b) FROM per) * 10000) AS BIGINT) AS pct_bp
         |FROM per
         |ORDER BY b * 100.0 / (SELECT sum(b) FROM per) DESC, name LIMIT 5""".stripMargin,
    "q_widget_dstport" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT * FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-01 02:45:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-01 02:50:00'
         |    AND OutIfBoundary = 'external'),
         |per AS (SELECT Proto, DstPort,
         |    CAST(sum(Bytes*SamplingRate) AS BIGINT) AS b
         |  FROM f GROUP BY 1, 2)
         |SELECT coalesce($protoCaseSql, '???') || '/' || CAST(DstPort AS VARCHAR) AS name,
         |  CAST(floor(b * 100.0 / (SELECT sum(b) FROM per) * 10000) AS BIGINT) AS pct_bp
         |FROM per
         |ORDER BY b * 100.0 / (SELECT sum(b) FROM per) DESC, name LIMIT 5""".stripMargin,
    "q_widget_rate" ->
      s"""WITH flows AS ($F)
         |SELECT CAST(count(*) AS BIGINT) AS flows FROM flows
         |WHERE TimeReceived >= TIMESTAMP '2024-01-28 23:55:00'
         |  AND TimeReceived < TIMESTAMP '2024-01-29 00:00:00'""".stripMargin,
    "q_community_freq" ->
      """SELECT CAST(64496 AS VARCHAR) || ':' ||
        |    CAST(event_id % 4 AS VARCHAR) AS community,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY n DESC, community LIMIT 10""".stripMargin,
    "q_filter_dsl" ->
      s"""WITH flows AS ($F)
         |SELECT SrcCountry, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(Bytes) AS BIGINT) AS bytes
         |FROM flows
         |WHERE SrcCountry IN ('US', 'JP') AND SrcPort >= 3000
         |  AND NOT (Proto = 17) AND ExporterName LIKE 'exp%'
         |GROUP BY 1""".stripMargin,
    "q_filter_dsl_rev" ->
      s"""WITH flows AS ($F)
         |SELECT DstCountry, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(Bytes) AS BIGINT) AS bytes
         |FROM flows
         |WHERE DstCountry IN ('US', 'JP') AND DstPort >= 3000
         |  AND NOT (Proto = 17) AND ExporterName LIKE 'exp%'
         |GROUP BY 1""".stripMargin
  )
}
