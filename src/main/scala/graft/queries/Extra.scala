package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Lpm, Render}
import graft.operators.similarity.CosineSearch
import graft.store.EventFlows

/** Round-2 coverage queries for the remaining SURVEY §2 inventory rows:
  * J5 (networks LPM lookup), P4/P5/P6 (render expressions), A5 (multi-arg
  * count-distinct utilization), A12 (per-series client stats incl. the
  * 95th percentile with linear interpolation), and the IVF ANN variant.
  */
object Extra {
  type Q = (SparkSession, String) => DataFrame

  // --- J5: longest-prefix-match lookup against a broadcast prefix table ----
  // Prefix table: /16 per nation under an enclosing /8 whose attributes
  // children inherit (reference `outlet/networks/root.go:198-299` flattens
  // inheritance at build; lookup is most-specific-wins).
  val qLpmLookup: Q = (s, dir) => {
    val entries = (0 until 25).map(n =>
      Lpm.PrefixEntry(s"10.$n.0.0/16", Map("name" -> s"n$n"))) :+
      Lpm.PrefixEntry("10.0.0.0/8", Map("name" -> "other", "region" -> "global"))
    val table = Lpm.Table.build(entries)
    // 10.(key%200).((key>>8)&0xff).1 via the codegen'd builder — no UDF
    val addrUdf = (key: org.apache.spark.sql.Column) =>
      graft.functions.Ip.v4Mapped10(
        pmod(key, lit(200L)) * 65536L +
          pmod(floor(key / 256).cast("long"), lit(256L)) * 256L + 1L)
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), addrUdf(col("c_custkey")).as("addr"))
      .select(col("c_custkey"),
        Lpm.lookupAttr(table, "name")(col("addr")).as("name"),
        Lpm.lookupAttr(table, "region")(col("addr")).as("region"))
  }

  // --- J4: BGP RIB lookup with next-hop preference --------------------------
  // Multi-route prefixes: the flow's next hop picks among per-peer routes,
  // falling back to the first (reference bmp/rib.go:451-492). Addresses and
  // preferred next hops derive from integer columns so the DuckDB oracle
  // reduces to exact CASE arithmetic.
  val qRibLookup: Q = (s, dir) => {
    import graft.functions.{Ip, Rib}
    val table = Rib.Table.build(Seq(
      Rib.RouteEntry("10.0.0.0/24", Rib.Route("10.9.9.1", 65001,
        asPath = Seq(64500L, 65001L), communities = Seq(650010L))),
      Rib.RouteEntry("10.0.0.0/24", Rib.Route("10.9.9.2", 65002,
        asPath = Seq(64500L, 65002L), communities = Seq(650020L))),
      Rib.RouteEntry("10.0.1.0/24", Rib.Route("10.9.9.2", 65011,
        asPath = Seq(64500L, 65011L), communities = Seq(650110L))),
      Rib.RouteEntry("10.0.0.0/22", Rib.Route("10.9.9.1", 65099,
        asPath = Seq(64500L, 65099L), communities = Seq(650990L))),
      Rib.RouteEntry("10.0.0.0/22", Rib.Route("10.9.9.3", 65100,
        asPath = Seq(64500L, 65100L), communities = Seq(651000L)))))
    val dst = Ip.v4Mapped10(col("event_id") % 1024)
    val nh = Ip.v4Mapped10(lit(9L * 65536 + 9L * 256 + 1) + col("user_id") % 3)
    Tables.load(s, dir, "events")
      .select(
        Rib.lookup(table, "asn")(dst, nh).as("asn"),
        Rib.lookup(table, "netmask")(dst, nh).as("netmask"),
        concat_ws(" ", Rib.lookup(table, "aspath")(dst, nh)).as("path"),
        concat_ws(" ", Rib.lookup(table, "communities")(dst, nh)).as("comms"),
        Ip.ipToString(Rib.lookup(table, "nexthop")(dst, nh)).as("nh_out"))
      .groupBy("asn", "netmask", "path", "comms", "nh_out")
      .agg(count(lit(1)).as("n"))
  }

  // --- P4/P5/P6/P2: scalar render expressions over events -------------------
  val qRender: Q = (s, dir) => {
    val e = col("event_id")
    val u = col("user_id")
    Tables.load(s, dir, "events").select(
      e.as("event_id"),
      Render.mac(e).as("mac_str"),
      Render.community(u % 100 * 65536 + e % 65536).as("comm_str"),
      Render.arrayRender(array(lit(64496) + e % 32, lit(64497) + e % 32)
        .cast("array<string>")).as("path_str"),
      Render.etype(when(e % 10 < 8, 2048L).otherwise(34525L)).as("etype_str"))
  }

  // --- A5: interface-utilization percent with multi-arg COUNT(DISTINCT) ----
  // (reference `clickhouse.go:195-199`: SUM(bytes·rate·8·100/(speed·1e6)) /
  // COUNT(DISTINCT exporter, ifname), NaN→0). Integer per-mille output —
  // the division order below must match the oracle exactly.
  val qUtilPct: Q = (s, dir) => {
    EventFlows.flows(s, dir)
      .groupBy(col("InIfName"))
      .agg(
        sum(col("Bytes")).as("sum_b"),
        max(col("InIfSpeed")).as("speed"),
        countDistinct(col("ExporterName"), col("InIfName")).as("cd"))
      .select(col("InIfName"),
        expr("sum_b * 1000 * 8 * 1000 div (speed * 1000000) div cd")
          .as("util_pm"))
  }

  // --- A12: per-series stats over the flagship line result ------------------
  // The reference computes these driver-side over ≤ rows×2000 points
  // (`console/line.go:390-446`); here they are a Spark aggregation over the
  // dense per-series point arrays, so the same stats scale to any series
  // count: avg, min (nonzero), max, last(-2), p95 linear interpolation.
  val qLineStats: Q = (s, dir) => {
    val line = Flow.qLine(s, dir).select(col("name"), col("time_s"),
      col("bps_sum"))
    val cal = line.select("time_s").distinct()
    val series = line.select("name").distinct()
    val dense = series.crossJoin(cal)
      .join(line, Seq("name", "time_s"), "left")
      .select(col("name"), col("time_s"),
        coalesce(col("bps_sum"), lit(0L)).as("w"))
    val agged = dense.groupBy("name").agg(
      count(lit(1)).as("n"),
      sum("w").as("sum_w"),
      max("w").as("max_b"),
      coalesce(min(when(col("w") > 0, col("w"))), lit(0L)).as("min_nz"),
      sort_array(collect_list(struct(col("time_s"), col("w")))).as("by_time"))
    val vals = array_sort(transform(col("by_time"), _.getField("w")))
    val rank = lit(0.95) * (col("n") - 1)
    val lo = floor(rank)
    val hi = ceil(rank)
    val p95 = element_at(vals, (lo + 1).cast("int")) +
      (rank - lo) * (element_at(vals, (hi + 1).cast("int")) -
        element_at(vals, (lo + 1).cast("int")))
    agged.select(
      col("name"),
      col("n"),
      expr("sum_w div n").as("avg_b"),
      col("min_nz"),
      col("max_b"),
      when(col("n") >= 2,
        element_at(col("by_time"), (col("n") - 1).cast("int")).getField("w"))
        .otherwise(element_at(col("by_time"), 1).getField("w")).as("last_b"),
      round(p95 * 1000).cast("long").as("p95_e3"))
  }

  // --- §1.4 exporters table: ARRAY JOIN unpivot + ReplacingMergeTree read --
  // One row per (exporter, interface): the In/Out interface attribute pairs
  // unpivot via explode (J7, reference `migrations_helpers.go:277-322`) and
  // the latest row per key wins (ReplacingMergeTree(TimeReceived) read
  // semantics). Ties order deterministically over all attributes.
  val qExporters: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ex = EventFlows.flows(s, dir)
      .select(col("TimeReceived"), col("ExporterName"),
        explode(array(
          struct(col("InIfName").as("IfName"),
            col("InIfDescription").as("IfDescription"),
            col("InIfSpeed").as("IfSpeed"),
            col("InIfProvider").as("IfProvider"),
            col("InIfBoundary").as("IfBoundary")),
          struct(col("OutIfName").as("IfName"),
            col("OutIfDescription").as("IfDescription"),
            col("OutIfSpeed").as("IfSpeed"),
            col("OutIfProvider").as("IfProvider"),
            col("OutIfBoundary").as("IfBoundary")))).as("i"))
      .select(col("TimeReceived"), col("ExporterName"), col("i.*"))
    val w = Window.partitionBy("ExporterName", "IfName")
      .orderBy(desc("TimeReceived"), desc("IfDescription"), desc("IfSpeed"),
        desc("IfProvider"), desc("IfBoundary"))
    ex.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("ExporterName"), col("IfName"), col("IfDescription"),
        col("IfSpeed"), col("IfProvider"), col("IfBoundary"),
        unix_timestamp(col("TimeReceived")).as("last_seen"))
  }

  // --- P8: port labeling with protocol-specific service dictionaries -------
  // `multiIf(Proto=6, concat(port,'/',dictTCP), Proto=17, ...,
  // toString(port))` + trailing-'/' strip (reference `column.go:163-180`).
  val qPortLabel: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    val tcp = Seq((443, "https"), (80, "http"), (53, "domain"))
      .toDF("p_tcp", "tcp_name")
    val udp = Seq((53, "domain")).toDF("p_udp", "udp_name")
    val flows = EventFlows.flows(s, dir)
      .join(broadcast(tcp), col("DstPort") === col("p_tcp"), "left")
      .join(broadcast(udp), col("DstPort") === col("p_udp"), "left")
    val raw = when(col("Proto") === 6,
        concat(col("DstPort").cast("string"), lit("/"), coalesce(col("tcp_name"), lit(""))))
      .when(col("Proto") === 17,
        concat(col("DstPort").cast("string"), lit("/"), coalesce(col("udp_name"), lit(""))))
      .otherwise(col("DstPort").cast("string"))
    flows
      .select(regexp_replace(raw, "/$", "").as("port_label"))
      .groupBy("port_label")
      .agg(count(lit(1)).as("n"))
  }

  // --- widget graph: single-series gap-filled Gbps (widgets.go:250-292) ----
  // also the only oracle coverage of the dimensionless LineQuery path
  val qWidgetGraph: Q = (s, dir) => {
    import java.sql.Timestamp
    import java.time.Instant
    val w = new graft.queryengine.Widgets(
      graft.schema.FlowSchema.schema, EventFlows.tables(s, dir))
    w.graph(s,
      Timestamp.from(Instant.parse("2024-01-15T00:00:00Z")),
      Timestamp.from(Instant.parse("2024-01-16T00:00:00Z")), points = 24)
      .select(col("time_s"),
        round(col("gbps") * 1e9 * 3600).cast("long").as("bits_sum"))
  }

  // --- J2/§1.1: custom-dictionary generated columns -------------------------
  // A user dictionary keyed on SrcAS generates a SrcASTier column (misses
  // get the dictGetOrDefault default), which then acts as a normal
  // dimension: filterable via the DSL after schema registration, groupable
  // here.
  val qCustomDict: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    val dictSource = (0 until 10).map(i =>
      (64496L + i, if (i % 2 == 0) "gold" else "silver")).toDF("asn", "tier")
    val dict = graft.schema.CustomDict("astiers", "SrcAS", "asn",
      Map("tier" -> "SrcASTier"))
    graft.streaming.Enrichment
      .withCustomDict(EventFlows.flows(s, dir), dict, dictSource)
      .groupBy("SrcASTier")
      .agg(count(lit(1)).as("n"), sum("Bytes").as("bytes"))
  }

  // --- J2 ip_trie layout: prefix-keyed custom dictionary resolved by LPM
  // over SrcAddr (nested prefixes exercise parent-attribute inheritance:
  // the /23 carries no zone and inherits the /16's) ---
  val qCustomDictTrie: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    val dictSource = Seq(
      ("10.0.0.0/16", Some("base"), Some("z0")),
      ("10.0.2.0/23", Some("mid"), None),
      ("10.0.3.0/24", Some("top"), Some("z3")))
      .toDF("prefix", "tier", "zone")
    val dict = graft.schema.CustomDict("netzones", "SrcAddr", "prefix",
      scala.collection.immutable.ListMap(
        "tier" -> "SrcTier", "zone" -> "SrcZone"), default = "unknown")
    graft.streaming.Enrichment
      .withCustomDictTrie(EventFlows.flows(s, dir), dict, dictSource)
      .groupBy("SrcTier", "SrcZone")
      .agg(count(lit(1)).as("n"), sum("Bytes").as("bytes"))
  }

  // --- P12: ALIAS (computed-on-read) columns via the schema view layer -----
  // SrcNetPrefix is never stored: the view attaches
  // ipToString(SrcAddr)/SrcNetMask at read (reference ALIAS columns,
  // `definition.go:294-298`); Catalyst prunes it when unused.
  val qAliasPrefix: Q = (s, dir) => {
    graft.schema.FlowSchema.schema
      .withAliasColumns(EventFlows.flows(s, dir))
      .groupBy("SrcNetPrefix")
      .agg(count(lit(1)).as("n"))
  }

  // --- §3.3 value completion: match-position then frequency ranking --------
  val qCompletionValues: Q = (s, dir) =>
    graft.queryengine.Completion.values(
      Tables.load(s, dir, "customer"), "c_mktsegment", "u", None, 10)

  // --- IVF ANN over embeddings (rows-only check; recall spec-verified) -----
  val qSimIvf: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    CosineSearch.ivfTopK(
      e.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding")),
      e.select(col("vec_id").as("id"), col("embedding")), k = 5)
  }

  // --- I6: classifier rules (reference expr-lang classifiers compiled to
  // Column predicates): reject first, then first-match-wins assignment ---
  val qClassifier: Q = (s, dir) => {
    import graft.streaming.Enrichment
    val rules = Seq(
      Enrichment.Rule(col("Proto") === 1, reject = true),
      Enrichment.Rule(col("DstPort") === 443,
        Map("FlowTenant" -> lit("secure"))),
      Enrichment.Rule(col("DstPort") === 53, Map("FlowTenant" -> lit("dns"))),
      Enrichment.Rule(lit(true), Map("FlowTenant" -> lit("default"))))
    Enrichment.withClassifiers(EventFlows.flows(s, dir), rules)
      .groupBy("FlowTenant").agg(count(lit(1)).as("n"))
  }

  // --- sessionization: per-user inactivity-gap sessions (window-only) ------
  val qSessionize: Q = (s, dir) => {
    import graft.operators.session.Sessionize
    Sessionize.sessionStats(
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id")),
      "user_id", "ts", "event_id", gapSec = 3600)
  }

  // --- as-of join: each purchase attributed to the user's most recent
  // prior view (the "state at event time" primitive). One union + one
  // user-keyed window — a single shuffle, no range-join pair explosion.
  val qAsofJoin: Q = (s, dir) => {
    import graft.operators.join.AsOf
    val e = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("es"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id"), col("es").as("v_es"),
        col("event_id").as("view_event"))
    AsOf.joinBackward(purchases, views, Seq("user_id"),
        leftTs = "es", rightTs = "v_es", payload = Seq("view_event"),
        rightTie = "view_event", matchedTs = "view_es")
      .select(col("event_id"), col("user_id"), col("es"),
        col("view_es"), col("view_event"),
        (col("es") - col("view_es")).as("gap_s"))
  }

  // --- bucketized range join: events × active windows -----------------------
  // 120 synthetic ops windows (6 h stride, 1.5–12 h lengths — some overlap,
  // so the join is genuinely many-to-many) over the events month; the
  // operator turns the non-equi containment predicate into a bucket
  // equi-join (see RangeJoin) instead of the nested loop Spark would
  // otherwise plan.
  val qRangeJoin: Q = (s, dir) => {
    import graft.operators.join.RangeJoin
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), unix_timestamp(col("ts")).as("es"))
    val t0 = 1704067200L // 2024-01-01 00:00:00 UTC, the table's epoch
    val iv = s.range(120).select(
      col("id").as("wid"),
      (lit(t0) + col("id") * 21600L).as("w_start"),
      (lit(t0) + col("id") * 21600L + (pmod(col("id"), lit(8L)) + 1L) * 5400L)
        .as("w_end"))
    RangeJoin.pointInInterval(ev, "es", iv, "w_start", "w_end",
        bucket = 21600L)
      .groupBy("wid")
      .agg(count(lit(1)).as("n_events"),
        min("event_id").as("first_event"), max("event_id").as("last_event"))
  }

  // --- interval×interval overlap join: per-user daily activity spans vs
  // the ops windows — "whose activity crossed which window". Both sides
  // bucketized (RangeJoin.intervalOverlap), so the plan is a broadcast
  // hash equi-join with a one-claim-per-pair filter, never a nested loop.
  val qOverlapJoin: Q = (s, dir) => {
    import graft.operators.join.RangeJoin
    val t0 = 1704067200L
    val spans = Tables.load(s, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
      .groupBy(col("user_id"), expr("es div 86400").as("day"))
      .agg(min("es").as("a_start"), (max("es") + 1L).as("a_end"))
    val iv = s.range(120).select(
      col("id").as("wid"),
      (lit(t0) + col("id") * 21600L).as("w_start"),
      (lit(t0) + col("id") * 21600L + (pmod(col("id"), lit(8L)) + 1L) * 5400L)
        .as("w_end"))
    RangeJoin.intervalOverlap(spans, "a_start", "a_end",
        iv, "w_start", "w_end", bucket = 21600L)
      .groupBy("wid")
      .agg(count(lit(1)).as("n_spans"),
        countDistinct(col("user_id")).as("n_users"))
  }

  // --- funnel analysis: view → click → purchase, first-touch, 7-day windows.
  // Each stage joins the previous stage's user frontier against a
  // type-pruned scan — the fact table never self-joins, and the join
  // strategy is left to Catalyst/AQE (broadcast while the frontier is
  // small, shuffled hash join once user counts outgrow it).
  val qFunnel: Q = (s, dir) => {
    val win = 604800L
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("es").as("v_es"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("es") >= col("v_es") && col("es") <= col("v_es") + win)
      .groupBy("user_id").agg(min("es").as("c_es"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("es") >= col("c_es") && col("es") <= col("c_es") + win)
      .groupBy("user_id").agg(min("es").as("p_es"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
  }

  // --- cohort retention: users grouped by first-activity week, counted in
  // each later week they return. The (user, week) activity set reduces
  // map-side before its one shuffle; the first-week table joins back on
  // the user key with the strategy left to Catalyst/AQE (both sides are
  // already user-keyed aggregates).
  val qRetention: Q = (s, dir) => {
    val wk = expr("CAST(unix_timestamp(ts) AS BIGINT) div 604800")
    val activity = Tables.load(s, dir, "events")
      .select(col("user_id"), wk.as("wk")).distinct()
    val first = activity.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    activity.join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  // --- sequence mining: Markov transition counts over each user's
  // time-ordered event stream (one user-keyed shuffle shared by the lead
  // window; the count reduces map-side). Whole-second ordering with the
  // event id tiebreak, like sessionization.
  val qTransitions: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val es = unix_timestamp(col("ts"))
    val w = Window.partitionBy("user_id").orderBy(es, col("event_id"))
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
  }

  val defs: Map[String, Q] = Map(
    "q_transitions" -> qTransitions,
    "q_retention" -> qRetention,
    "q_funnel" -> qFunnel,
    "q_asof_join" -> qAsofJoin,
    "q_range_join" -> qRangeJoin,
    "q_overlap_join" -> qOverlapJoin,
    "q_sessionize" -> qSessionize,
    "q_classifier" -> qClassifier,
    "q_lpm_lookup" -> qLpmLookup,
    "q_rib_lookup" -> qRibLookup,
    "q_render" -> qRender,
    "q_util_pct" -> qUtilPct,
    "q_line_stats" -> qLineStats,
    "q_exporters" -> qExporters,
    "q_port_label" -> qPortLabel,
    "q_widget_graph" -> qWidgetGraph,
    "q_custom_dict" -> qCustomDict,
    "q_alias_prefix" -> qAliasPrefix,
    "q_completion_values" -> qCompletionValues,
    "q_custom_dict_trie" -> qCustomDictTrie,
    "q_sim_ivf" -> qSimIvf
  )

  private val F = EventFlows.flowsSql

  val oracles: Map[String, String] = Map(
    // selection replicated as CASE arithmetic: b2 = dst's third octet picks
    // the prefix, u = user_id%3 the preferred next hop 10.9.9.(1+u)
    "q_rib_lookup" ->
      """WITH f AS (SELECT (event_id % 1024) // 256 AS b2, user_id % 3 AS u
        |  FROM events),
        |sel AS (SELECT
        |  CASE WHEN b2 = 0 THEN CASE WHEN u = 1 THEN 65002 ELSE 65001 END
        |       WHEN b2 = 1 THEN 65011
        |       ELSE CASE WHEN u = 2 THEN 65100 ELSE 65099 END END AS asn,
        |  CASE WHEN b2 <= 1 THEN 24 ELSE 22 END AS netmask,
        |  CASE WHEN b2 = 0 THEN CASE WHEN u = 1 THEN '10.9.9.2' ELSE '10.9.9.1' END
        |       WHEN b2 = 1 THEN '10.9.9.2'
        |       ELSE CASE WHEN u = 2 THEN '10.9.9.3' ELSE '10.9.9.1' END END AS nh_out
        |  FROM f)
        |SELECT asn, netmask, '64500 ' || CAST(asn AS VARCHAR) AS path,
        |  CAST(asn * 10 AS VARCHAR) AS comms, nh_out,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM sel GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    // the trie prefixes are chosen so LPM over the synthetic SrcAddr
    // (10.0.(uid>>8).(uid&255)) reduces to exact integer CASE arithmetic
    "q_custom_dict_trie" ->
      """SELECT CASE WHEN user_id // 256 = 3 THEN 'top'
        |            WHEN user_id // 256 = 2 THEN 'mid'
        |            ELSE 'base' END AS SrcTier,
        |  CASE WHEN user_id // 256 = 3 THEN 'z3' ELSE 'z0' END AS SrcZone,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT) + 40) AS BIGINT) AS bytes
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es FROM events),
        |p AS (SELECT event_type, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY es, event_id) AS next_type FROM e)
        |SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2""".stripMargin,
    // IVF with the deterministic lowest-id codebook is fully
    // SQL-replicable: centroids derive from the table (rank order of
    // vec_id), corpus vectors assign to their argmax-cosine cell (the
    // row's own norm divides out), queries probe their 4 best cells, and
    // the re-rank matches q_sim_topk's cosine form. (The TRAINED-codebook
    // IVF stays rows-only: k-means means are not cross-engine portable.)
    "q_sim_ivf" ->
      """WITH c0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings),
        |q0 AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
        |    CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings ORDER BY vec_id LIMIT 16),
        |ca AS (SELECT id, cell FROM (
        |  SELECT id, cell, row_number() OVER (PARTITION BY id
        |    ORDER BY -list_dot_product(cv, e) / sqrt(list_dot_product(e, e)),
        |      cell) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |qa AS (SELECT qid, cell FROM (
        |  SELECT qid, cell, row_number() OVER (PARTITION BY qid
        |    ORDER BY -list_dot_product(qv, e) / sqrt(list_dot_product(e, e)),
        |      cell) AS rn
        |  FROM q0, cent) WHERE rn <= 4),
        |sims AS (SELECT DISTINCT qid, id,
        |    CAST(round(list_cosine_similarity(qv, cv) * 1000000) AS BIGINT)
        |      AS sim_e6
        |  FROM ca JOIN c0 USING (id) JOIN qa USING (cell) JOIN q0 USING (qid)
        |  WHERE qid != id)
        |SELECT qid, CAST(rank AS INT) AS rank, id, sim_e6 FROM (
        |  SELECT qid, id, sim_e6, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim_e6 DESC, id) AS rank
        |  FROM sims) WHERE rank <= 5""".stripMargin,
    "q_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 604800 AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY 1)
        |SELECT cohort_wk, wk - cohort_wk AS offset_wk,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es FROM events),
        |u AS (
        |  SELECT user_id, es, 1 AS side, event_id,
        |    CAST(NULL AS BIGINT) AS r_event, CAST(NULL AS BIGINT) AS r_es
        |  FROM e WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, es, 0 AS side, NULL, event_id, es
        |  FROM e WHERE event_type = 'view'),
        |w AS (SELECT user_id, es, side, event_id,
        |    last_value(r_event IGNORE NULLS) OVER sw AS view_event,
        |    last_value(r_es IGNORE NULLS) OVER sw AS view_es
        |  FROM u WINDOW sw AS (PARTITION BY user_id
        |    ORDER BY es, side, coalesce(r_event, event_id)
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT event_id, user_id, es, CAST(view_es AS BIGINT) AS view_es,
        |  CAST(view_event AS BIGINT) AS view_event,
        |  CAST(es - view_es AS BIGINT) AS gap_s
        |FROM w WHERE side = 1""".stripMargin,
    "q_range_join" ->
      """WITH e AS (SELECT event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es FROM events),
        |w AS (SELECT CAST(i AS BIGINT) AS wid,
        |    1704067200 + i * 21600 AS ws,
        |    1704067200 + i * 21600 + ((i % 8) + 1) * 5400 AS we
        |  FROM (SELECT unnest(range(0, 120)) AS i) r)
        |SELECT wid, CAST(count(*) AS BIGINT) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM e JOIN w ON e.es >= w.ws AND e.es < w.we
        |GROUP BY 1""".stripMargin,
    "q_overlap_join" ->
      """WITH e AS (SELECT user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es FROM events),
        |a AS (SELECT user_id, es // 86400 AS day,
        |    min(es) AS a_start, max(es) + 1 AS a_end FROM e GROUP BY 1, 2),
        |w AS (SELECT CAST(i AS BIGINT) AS wid,
        |    1704067200 + i * 21600 AS ws,
        |    1704067200 + i * 21600 + ((i % 8) + 1) * 5400 AS we
        |  FROM (SELECT unnest(range(0, 120)) AS i) r)
        |SELECT wid, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a JOIN w ON a.a_start < w.we AND w.ws < a.a_end
        |GROUP BY 1""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es FROM events),
        |v AS (SELECT user_id, min(es) AS v_es FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(es) AS c_es FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND es >= v_es AND es <= v_es + 604800
        |  GROUP BY 1),
        |p AS (SELECT e.user_id, min(es) AS p_es FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND es >= c_es AND es <= c_es + 604800
        |  GROUP BY 1)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es FROM events),
        |m AS (SELECT user_id, es, event_id,
        |    CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 3600
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |sx AS (SELECT user_id, es, sum(brk) OVER (
        |    PARTITION BY user_id ORDER BY es, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(es) AS BIGINT) AS start_s, CAST(max(es) AS BIGINT) AS end_s,
        |  CAST(max(es) - min(es) AS BIGINT) AS duration_s
        |FROM sx GROUP BY 1, 2""".stripMargin,
    "q_classifier" ->
      s"""WITH flows AS ($F)
         |SELECT CASE WHEN DstPort = 443 THEN 'secure'
         |            WHEN DstPort = 53 THEN 'dns'
         |            ELSE 'default' END AS FlowTenant,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM flows WHERE (Proto = 1) IS NOT TRUE GROUP BY 1""".stripMargin,
    "q_lpm_lookup" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 200 < 25 THEN 'n' || CAST(c_custkey % 200 AS VARCHAR)
        |       ELSE 'other' END AS name,
        |  'global' AS region
        |FROM customer""".stripMargin,
    "q_render" ->
      """SELECT event_id,
        |  substr(printf('%012x', event_id), 1, 2) || ':' ||
        |  substr(printf('%012x', event_id), 3, 2) || ':' ||
        |  substr(printf('%012x', event_id), 5, 2) || ':' ||
        |  substr(printf('%012x', event_id), 7, 2) || ':' ||
        |  substr(printf('%012x', event_id), 9, 2) || ':' ||
        |  substr(printf('%012x', event_id), 11, 2) AS mac_str,
        |  CAST(user_id % 100 AS VARCHAR) || ':' ||
        |    CAST(event_id % 65536 AS VARCHAR) AS comm_str,
        |  CAST(64496 + event_id % 32 AS VARCHAR) || ' ' ||
        |    CAST(64497 + event_id % 32 AS VARCHAR) AS path_str,
        |  CASE WHEN event_id % 10 < 8 THEN 'IPv4' ELSE 'IPv6' END AS etype_str
        |FROM events""".stripMargin,
    "q_util_pct" ->
      s"""WITH flows AS ($F)
         |SELECT InIfName,
         |  CAST(sum(Bytes) * 1000 * 8 * 1000
         |    // (max(InIfSpeed) * 1000000)
         |    // count(DISTINCT (ExporterName, InIfName)) AS BIGINT) AS util_pm
         |FROM flows GROUP BY 1""".stripMargin,
    "q_exporters" ->
      s"""WITH flows AS ($F),
         |ex AS (
         |  SELECT TimeReceived, ExporterName, InIfName AS IfName,
         |    InIfDescription AS IfDescription, InIfSpeed AS IfSpeed,
         |    InIfProvider AS IfProvider, InIfBoundary AS IfBoundary
         |  FROM flows
         |  UNION ALL
         |  SELECT TimeReceived, ExporterName, OutIfName,
         |    OutIfDescription, OutIfSpeed, OutIfProvider, OutIfBoundary
         |  FROM flows),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY ExporterName, IfName
         |    ORDER BY TimeReceived DESC, IfDescription DESC, IfSpeed DESC,
         |      IfProvider DESC, IfBoundary DESC) AS rn
         |  FROM ex)
         |SELECT ExporterName, IfName, IfDescription,
         |  CAST(IfSpeed AS BIGINT) AS IfSpeed, IfProvider, IfBoundary,
         |  CAST(epoch(date_trunc('second', TimeReceived)) AS BIGINT) AS last_seen
         |FROM r WHERE rn = 1""".stripMargin,
    "q_completion_values" ->
      """WITH vals AS (SELECT c_mktsegment AS v, count(*) AS freq
        |  FROM customer GROUP BY 1)
        |SELECT v, CAST(freq AS BIGINT) AS freq FROM vals
        |WHERE position('u' IN lower(v)) > 0
        |ORDER BY position('u' IN lower(v)), freq DESC, v LIMIT 10""".stripMargin,
    "q_alias_prefix" ->
      """SELECT '10.0.' || CAST(user_id // 256 AS VARCHAR) || '.' ||
        |    CAST(user_id % 256 AS VARCHAR) || '/24' AS SrcNetPrefix,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_custom_dict" ->
      s"""WITH flows AS ($F)
         |SELECT CASE WHEN SrcAS - 64496 < 10 THEN
         |    (CASE WHEN (SrcAS - 64496) % 2 = 0 THEN 'gold' ELSE 'silver' END)
         |  ELSE '???' END AS SrcASTier,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(Bytes) AS BIGINT) AS bytes
         |FROM flows GROUP BY 1""".stripMargin,
    "q_port_label" ->
      s"""WITH flows AS ($F),
         |lab AS (SELECT regexp_replace(
         |  CASE WHEN Proto = 6 THEN CAST(DstPort AS VARCHAR) || '/' ||
         |    coalesce(CASE DstPort WHEN 443 THEN 'https' WHEN 80 THEN 'http'
         |      WHEN 53 THEN 'domain' END, '')
         |  WHEN Proto = 17 THEN CAST(DstPort AS VARCHAR) || '/' ||
         |    coalesce(CASE DstPort WHEN 53 THEN 'domain' END, '')
         |  ELSE CAST(DstPort AS VARCHAR) END, '/$$', '') AS port_label
         |  FROM flows)
         |SELECT port_label, CAST(count(*) AS BIGINT) AS n
         |FROM lab GROUP BY 1""".stripMargin,
    "q_widget_graph" ->
      s"""WITH flows AS ($F),
         |f AS (SELECT * FROM flows
         |  WHERE TimeReceived >= TIMESTAMP '2024-01-15 00:00:00'
         |    AND TimeReceived < TIMESTAMP '2024-01-16 00:00:00'),
         |per AS (SELECT CAST(epoch(date_trunc('hour', TimeReceived)) AS BIGINT) AS time_s,
         |  CAST(sum(Bytes*SamplingRate*8) AS BIGINT) AS bits_sum
         |  FROM f GROUP BY 1),
         |cal AS (SELECT unnest(range(1705276800, 1705276800 + 86400, 3600)) AS time_s)
         |SELECT c.time_s, coalesce(p.bits_sum, 0) AS bits_sum
         |FROM cal c LEFT JOIN per p ON c.time_s = p.time_s""".stripMargin,
    "q_line_stats" -> {
      val lineOracle = Flow.oracles("q_line")
      s"""WITH line AS ($lineOracle),
         |cal AS (SELECT DISTINCT time_s FROM line),
         |series AS (SELECT DISTINCT name FROM line),
         |dense AS (
         |  SELECT s.name, c.time_s, coalesce(l.bps_sum, 0) AS w
         |  FROM series s CROSS JOIN cal c
         |  LEFT JOIN line l ON l.name = s.name AND l.time_s = c.time_s),
         |agged AS (
         |  SELECT name, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(w) AS BIGINT) AS sum_w,
         |    CAST(max(w) AS BIGINT) AS max_b,
         |    coalesce(CAST(min(w) FILTER (WHERE w > 0) AS BIGINT), 0) AS min_nz,
         |    list(w ORDER BY time_s) AS by_time,
         |    list_sort(list(w)) AS vals
         |  FROM dense GROUP BY 1)
         |SELECT name, n, CAST(sum_w // n AS BIGINT) AS avg_b, min_nz, max_b,
         |  CAST(CASE WHEN n >= 2 THEN by_time[CAST(n - 1 AS INT)]
         |       ELSE by_time[1] END AS BIGINT) AS last_b,
         |  CAST(round((vals[CAST(floor(0.95*(n-1)) AS INT) + 1] +
         |    (0.95*(n-1) - floor(0.95*(n-1))) *
         |    (vals[CAST(ceil(0.95*(n-1)) AS INT) + 1] -
         |     vals[CAST(floor(0.95*(n-1)) AS INT) + 1])) * 1000) AS BIGINT)
         |    AS p95_e3
         |FROM agged""".stripMargin
    }
  )
}
