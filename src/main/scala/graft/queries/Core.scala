package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core operator-inventory queries (SURVEY.md §2.5, §2.7, §2.2) expressed
  * over the driver testdata, each with a DuckDB oracle in [[Core.oracles]].
  *
  * Determinism rules (oracle hash-compares values):
  *  - money/doubles → integer cents via round(x*100) cast long, BEFORE summing
  *    (double sums are order-dependent; integer sums are exact);
  *  - timestamps → epoch seconds (long);
  *  - every LIMIT has a full deterministic ORDER BY tie-break.
  */
object Core {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** round(x*100) as long — exact integer cents, same expression as oracle. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  // --- A1-A4: unit aggregations (fps/pps/l3bps analogues) -------------------
  val qAggUnits: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("fps"),
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("sum_disc_c"))
  }

  // --- A8 avg mode: ORDER BY SUM(units) DESC LIMIT n ------------------------
  val qTopNAvg: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(sum(cents(col("l_extendedprice"))).as("revenue_c"))
      .orderBy(desc("revenue_c"), asc("l_suppkey"))
      .limit(10)
  }

  // --- A8 max mode: inner GROUP BY (time,dims) then MAX ---------------------
  val qTopNMax: Q = (s, dir) => {
    t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"), col("user_id"))
      .agg(sum(cents(col("value"))).as("v_c"))
      .groupBy("user_id")
      .agg(max("v_c").as("peak_c"))
      .orderBy(desc("peak_c"), asc("user_id"))
      .limit(10)
  }

  // --- A8 last mode: WHERE time >= end-interval -----------------------------
  val qTopNLast: Q = (s, dir) => {
    t(s, dir, "events")
      .where(col("ts") >= lit("2024-01-30 00:00:00").cast("timestamp"))
      .groupBy("event_type")
      .agg(sum(cents(col("value"))).as("last_c"))
      .orderBy(desc("last_c"), asc("event_type"))
      .limit(10)
  }

  // --- A7: approximate top-K via the SpaceSaving sketch aggregate ----------
  // (reference `topKWeighted(limit, 20)(tuple(dims), weight)` on raw-table
  // scans; rows never shuffle — only fixed-size sketches do). Exact here
  // because distinct suppliers ≤ capacity = 10×20 at oracle scale.
  val qTopKSketch: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .select(col("l_suppkey").cast("string").as("k"),
        cents(col("l_extendedprice")).as("w"))
      .agg(graft.expressions.TopKWeighted(col("k"), col("w"), 10, 20).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.key").cast("long").as("l_suppkey"),
        col("e.weight").as("revenue_c"))
  }

  // --- J1/P1: dictionary-label lookup join (broadcast + coalesce default) ---
  val qDictJoin: Q = (s, dir) => {
    val customer = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
      .select(
        concat(col("c_nationkey").cast("string"), lit(": "),
          coalesce(col("n_name"), lit("???"))).as("nation_label"))
      .groupBy("nation_label")
      .agg(count(lit(1)).as("customers"))
  }

  // --- J6: top-N + "Other" folding ------------------------------------------
  val qOtherFold: Q = (s, dir) => {
    val customer = t(s, dir, "customer")
    val top = customer.groupBy("c_nationkey")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("c_nationkey"))
      .limit(3)
      .select(col("c_nationkey").as("top_key"))
    // broadcast semi-style left join against the bounded top-N set
    customer
      .join(broadcast(top), col("c_nationkey") === col("top_key"), "left")
      .select(when(col("top_key").isNotNull, col("c_nationkey").cast("string"))
        .otherwise(lit("Other")).as("nk"))
      .groupBy("nk")
      .agg(count(lit(1)).as("customers"))
  }

  // --- A6: grouped time-series (time bucket + dims) -------------------------
  val qTimeseries: Q = (s, dir) => {
    t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      .select(unix_timestamp(col("d")).as("time_s"), col("event_type"),
        col("n"), col("sum_c"))
  }

  // --- A9 merge-on-read: re-aggregate a finer rollup into a coarser one ----
  val qRollupReagg: Q = (s, dir) => {
    val oneMin = t(s, dir, "events")
      .groupBy(date_trunc("minute", col("ts")).as("m"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
    oneMin
      .groupBy(date_trunc("hour", col("m")).as("h"), col("event_type"))
      .agg(sum("n").as("n"), sum("sum_c").as("sum_c"))
      .select(unix_timestamp(col("h")).as("time_s"), col("event_type"),
        col("n"), col("sum_c"))
  }

  // --- W1: dense time axis (gap fill) ---------------------------------------
  val qGapfill: Q = (s, dir) => {
    val start = lit("2024-01-01 00:00:00").cast("timestamp")
    val end = lit("2024-01-07 23:00:00").cast("timestamp")
    val calendar = s.range(1)
      .select(explode(sequence(start, end, expr("INTERVAL 1 HOUR"))).as("h"))
    val agg = t(s, dir, "events")
      .where(col("event_type") === "signup")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    calendar.join(agg, Seq("h"), "left")
      .select(unix_timestamp(col("h")).as("time_s"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  // --- W2 + §2.7 UNION ALL axes: previous-period comparison -----------------
  val qPrevPeriod: Q = (s, dir) => {
    val events = t(s, dir, "events")
    def series(startLit: String, endLit: String, axis: Int, shiftDays: Int) =
      events
        .where(col("ts") >= lit(startLit).cast("timestamp") &&
          col("ts") < lit(endLit).cast("timestamp"))
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(cents(col("value"))).as("sum_c"))
        .select(lit(axis).as("axis"),
          (unix_timestamp(col("d")) + lit(shiftDays * 86400L)).as("time_s"),
          col("sum_c"))
    // axis 1: current week; axis 2: previous week shifted forward for overlay
    series("2024-01-08 00:00:00", "2024-01-15 00:00:00", 1, 0)
      .unionAll(series("2024-01-01 00:00:00", "2024-01-08 00:00:00", 2, 7))
  }

  // --- A10: percent-of-total via scalar aggregate ---------------------------
  val qPercentTotal: Q = (s, dir) => {
    val events = t(s, dir, "events")
    val per = events.groupBy("event_type")
      .agg(sum(cents(col("value"))).as("sum_c"))
    val total = per.agg(sum("sum_c").as("total_c"))
    per.crossJoin(broadcast(total))
      .select(col("event_type"),
        expr("sum_c * 1000000 div total_c").as("ppm"))
  }

  // --- A11: completion frequency --------------------------------------------
  val qCompletionFreq: Q = (s, dir) => {
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("event_type"))
      .limit(10)
  }

  // --- J7: ARRAY JOIN unpivot (explode of struct pairs) ---------------------
  val qUnpivot: Q = (s, dir) => {
    t(s, dir, "lineitem")
      .select(explode(array(
        struct(lit("part").as("kind"), col("l_partkey").as("key")),
        struct(lit("supp").as("kind"), col("l_suppkey").as("key")))).as("e"))
      .select(col("e.kind").as("kind"), col("e.key").as("key"))
      .groupBy("kind")
      .agg(countDistinct("key").as("distinct_keys"), count(lit(1)).as("n"))
  }

  // --- J6 semi-join: rows whose key is in a top-N subquery ------------------
  val qSemiJoin: Q = (s, dir) => {
    val events = t(s, dir, "events")
    val topUsers = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("user_id"))
      .limit(5)
      .select("user_id")
    events.join(broadcast(topUsers), Seq("user_id"), "left_semi")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
  }

  // --- §2.7: UNION DISTINCT of two candidate sets ---------------------------
  val qUnionDistinct: Q = (s, dir) => {
    t(s, dir, "events").select(col("event_type").as("v")).distinct()
      .union(t(s, dir, "customer").select(col("c_mktsegment").as("v")).distinct())
      .distinct()
  }

  // --- P7: TCP-flags-style bit decode ---------------------------------------
  val qBitDecode: Q = (s, dir) => {
    val letters = Seq("F", "S", "R", "P", "A", "U", "E", "C", "N")
    val flags = concat(letters.zipWithIndex.map { case (l, i) =>
      when((col("event_id").bitwiseAND(lit(1L << i))) > 0, lit(l)).otherwise(lit(""))
    }: _*)
    t(s, dir, "events")
      .select(flags.as("flags"))
      .groupBy("flags")
      .agg(count(lit(1)).as("n"))
  }

  // --- P12: multiIf bucket (packet-size-bucket analogue) --------------------
  val qBucket: Q = (s, dir) => {
    val v = col("value")
    val bucket = when(v < 64, "0-63")
      .when(v < 128, "64-127")
      .when(v < 256, "128-255")
      .when(v < 512, "256-511")
      .otherwise("512+")
    t(s, dir, "events")
      .select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
  }

  // --- W3: row_number window (first event per user) -------------------------
  val qWindowRowNum: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("first_event"))
  }

  // --- P11 analogue: IP derive + /24 truncation (pure integer math) ---------
  val qIpTruncate: Q = (s, dir) => {
    val ip = (col("user_id") * lit(2654435761L)) % lit(4294967296L)
    val masked = (ip.cast("long") / 256).cast("long") * 256
    val dotted = concat_ws(".",
      (masked / 16777216 % 256).cast("long").cast("string"),
      (masked / 65536 % 256).cast("long").cast("string"),
      (masked / 256 % 256).cast("long").cast("string"),
      lit("0"))
    t(s, dir, "events")
      .select(col("user_id"), dotted.as("net24"))
      .distinct()
  }

  val defs: Map[String, Q] = Map(
    "q_agg_units" -> qAggUnits,
    "q_topn_avg" -> qTopNAvg,
    "q_topn_max" -> qTopNMax,
    "q_topn_last" -> qTopNLast,
    "q_topk_sketch" -> qTopKSketch,
    "q_dict_join" -> qDictJoin,
    "q_other_fold" -> qOtherFold,
    "q_timeseries" -> qTimeseries,
    "q_rollup_reagg" -> qRollupReagg,
    "q_gapfill" -> qGapfill,
    "q_prev_period" -> qPrevPeriod,
    "q_percent_total" -> qPercentTotal,
    "q_completion_freq" -> qCompletionFreq,
    "q_unpivot" -> qUnpivot,
    "q_semi_join" -> qSemiJoin,
    "q_union_distinct" -> qUnionDistinct,
    "q_bit_decode" -> qBitDecode,
    "q_bucket" -> qBucket,
    "q_window_rownum" -> qWindowRowNum,
    "q_ip_truncate" -> qIpTruncate
  )

  val oracles: Map[String, String] = Map(
    "q_agg_units" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS fps,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_topn_avg" ->
      """SELECT l_suppkey,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem GROUP BY 1 ORDER BY revenue_c DESC, l_suppkey LIMIT 10""".stripMargin,
    "q_topn_max" ->
      """WITH per AS (
        |  SELECT date_trunc('day', ts) AS d, user_id,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v_c
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(max(v_c) AS BIGINT) AS peak_c FROM per
        |GROUP BY 1 ORDER BY peak_c DESC, user_id LIMIT 10""".stripMargin,
    "q_topn_last" ->
      """SELECT event_type,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS last_c
        |FROM events WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        |GROUP BY 1 ORDER BY last_c DESC, event_type LIMIT 10""".stripMargin,
    "q_topk_sketch" ->
      """SELECT l_suppkey,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem GROUP BY 1 ORDER BY revenue_c DESC, l_suppkey LIMIT 10""".stripMargin,
    "q_dict_join" ->
      """SELECT CAST(c_nationkey AS VARCHAR) || ': ' || coalesce(n_name, '???') AS nation_label,
        |  CAST(count(*) AS BIGINT) AS customers
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q_other_fold" ->
      """WITH top AS (
        |  SELECT c_nationkey FROM customer GROUP BY 1
        |  ORDER BY count(*) DESC, c_nationkey LIMIT 3)
        |SELECT CASE WHEN c_nationkey IN (SELECT c_nationkey FROM top)
        |  THEN CAST(c_nationkey AS VARCHAR) ELSE 'Other' END AS nk,
        |  CAST(count(*) AS BIGINT) AS customers
        |FROM customer GROUP BY 1""".stripMargin,
    "q_timeseries" ->
      """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS time_s, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_rollup_reagg" ->
      """WITH one_min AS (
        |  SELECT date_trunc('minute', ts) AS m, event_type,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |  FROM events GROUP BY 1, 2)
        |SELECT CAST(epoch(date_trunc('hour', m)) AS BIGINT) AS time_s, event_type,
        |  CAST(sum(n) AS BIGINT) AS n, CAST(sum(sum_c) AS BIGINT) AS sum_c
        |FROM one_min GROUP BY 1, 2""".stripMargin,
    "q_gapfill" ->
      """WITH cal AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS h),
        |agg AS (
        |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type = 'signup' GROUP BY 1)
        |SELECT CAST(epoch(cal.h) AS BIGINT) AS time_s,
        |  coalesce(agg.n, 0) AS n
        |FROM cal LEFT JOIN agg ON cal.h = agg.h""".stripMargin,
    "q_prev_period" ->
      """SELECT 1 AS axis, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS time_s,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 2
        |UNION ALL
        |SELECT 2 AS axis, CAST(epoch(date_trunc('day', ts)) AS BIGINT) + 604800 AS time_s,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'
        |GROUP BY 2""".stripMargin,
    "q_percent_total" ->
      """WITH per AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |  FROM events GROUP BY 1)
        |SELECT event_type, CAST(sum_c * 1000000 // (SELECT sum(sum_c) FROM per) AS BIGINT) AS ppm
        |FROM per""".stripMargin,
    "q_completion_freq" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, event_type LIMIT 10""".stripMargin,
    "q_unpivot" ->
      """WITH u AS (
        |  SELECT 'part' AS kind, l_partkey AS key FROM lineitem
        |  UNION ALL
        |  SELECT 'supp' AS kind, l_suppkey AS key FROM lineitem)
        |SELECT kind, CAST(count(DISTINCT key) AS BIGINT) AS distinct_keys,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM u GROUP BY 1""".stripMargin,
    "q_semi_join" ->
      """WITH top AS (
        |  SELECT user_id FROM events GROUP BY 1
        |  ORDER BY count(*) DESC, user_id LIMIT 5)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events WHERE user_id IN (SELECT user_id FROM top)
        |GROUP BY 1""".stripMargin,
    "q_union_distinct" ->
      """SELECT DISTINCT event_type AS v FROM events
        |UNION
        |SELECT DISTINCT c_mktsegment AS v FROM customer""".stripMargin,
    "q_bit_decode" ->
      """SELECT
        |  CASE WHEN (event_id & 1) > 0 THEN 'F' ELSE '' END ||
        |  CASE WHEN (event_id & 2) > 0 THEN 'S' ELSE '' END ||
        |  CASE WHEN (event_id & 4) > 0 THEN 'R' ELSE '' END ||
        |  CASE WHEN (event_id & 8) > 0 THEN 'P' ELSE '' END ||
        |  CASE WHEN (event_id & 16) > 0 THEN 'A' ELSE '' END ||
        |  CASE WHEN (event_id & 32) > 0 THEN 'U' ELSE '' END ||
        |  CASE WHEN (event_id & 64) > 0 THEN 'E' ELSE '' END ||
        |  CASE WHEN (event_id & 128) > 0 THEN 'C' ELSE '' END ||
        |  CASE WHEN (event_id & 256) > 0 THEN 'N' ELSE '' END AS flags,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_bucket" ->
      """SELECT CASE WHEN value < 64 THEN '0-63'
        |  WHEN value < 128 THEN '64-127'
        |  WHEN value < 256 THEN '128-255'
        |  WHEN value < 512 THEN '256-511'
        |  ELSE '512+' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_window_rownum" ->
      """SELECT user_id, first_event FROM (
        |  SELECT user_id, event_id AS first_event,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_ip_truncate" ->
      """SELECT DISTINCT user_id,
        |  CAST((user_id * 2654435761 % 4294967296) // 16777216 % 256 AS VARCHAR) || '.' ||
        |  CAST((user_id * 2654435761 % 4294967296) // 65536 % 256 AS VARCHAR) || '.' ||
        |  CAST((user_id * 2654435761 % 4294967296) // 256 % 256 AS VARCHAR) || '.0' AS net24
        |FROM events""".stripMargin
  )
}
