package graft.store

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queryengine.FlowTable

/** Deterministic mapping of the driver's `events` table onto the flow
  * schema (TESTDATA.md: "events plays the decoded-flow stream"). All
  * derivations are integer arithmetic so the DuckDB oracle can replicate
  * them bit-for-bit.
  */
object EventFlows {

  /** events → flow rows (the decoded-flow contract of SURVEY §2.8 I2).
    * Deliberately NOT cached/persisted: as a lazy projection, Catalyst
    * prunes it to exactly the columns a query touches (persisting would
    * force all ~50 columns, including the address UDFs, for every reader).
    */
  def flows(spark: SparkSession, dir: String): DataFrame = {
    // codegen'd ::ffff:10.x.y.z from the low 24 bits — this projection is
    // under EVERY flow query's scan, so it must not break codegen
    val ipUdf = (v: org.apache.spark.sql.Column) => graft.functions.Ip.v4Mapped10(v)
    Tables.load(spark, dir, "events")
      .select(
        col("ts").as("TimeReceived"),
        lit(1000L).as("SamplingRate"),
        ipUdf(col("user_id") % 8).as("ExporterAddress"),
        concat(lit("exp"), (col("user_id") % 8).cast("string")).as("ExporterName"),
        concat(lit("grp"), (col("user_id") % 3).cast("string")).as("ExporterGroup"),
        lit("edge").as("ExporterRole"),
        concat(lit("site"), (col("user_id") % 4).cast("string")).as("ExporterSite"),
        lit("emea").as("ExporterRegion"),
        lit("tenant0").as("ExporterTenant"),
        ipUdf(col("user_id")).as("SrcAddr"),
        ipUdf(col("event_id") % 1024).as("DstAddr"),
        lit(24).as("SrcNetMask"),
        lit(24).as("DstNetMask"),
        (lit(64496L) + col("user_id") % 20).as("SrcAS"),
        (lit(64496L) + col("event_id") % 32).as("DstAS"),
        (lit(64496L) + col("event_id") % 32).as("Dst1stAS"),
        (lit(64497L) + col("event_id") % 32).as("Dst2ndAS"),
        (lit(64498L) + col("event_id") % 32).as("Dst3rdAS"),
        array((lit(64496L) + col("event_id") % 32),
          (lit(64497L) + col("event_id") % 32)).as("DstASPath"),
        array(shiftleft(lit(64496L), 16) + col("event_id") % 4).as("DstCommunities"),
        array().cast("array<decimal(38,0)>").as("DstLargeCommunities"),
        concat(lit("net"), (col("user_id") % 5).cast("string")).as("SrcNetName"),
        concat(lit("net"), (col("event_id") % 5).cast("string")).as("DstNetName"),
        lit("cust").as("SrcNetRole"), lit("cust").as("DstNetRole"),
        lit("s1").as("SrcNetSite"), lit("s1").as("DstNetSite"),
        lit("r1").as("SrcNetRegion"), lit("r1").as("DstNetRegion"),
        lit("t1").as("SrcNetTenant"), lit("t1").as("DstNetTenant"),
        element_at(array(lit("US"), lit("FR"), lit("DE"), lit("JP")),
          (col("user_id") % 4 + 1).cast("int")).as("SrcCountry"),
        element_at(array(lit("US"), lit("FR"), lit("DE"), lit("JP")),
          (col("event_id") % 4 + 1).cast("int")).as("DstCountry"),
        concat(lit("eth"), (col("event_id") % 4).cast("string")).as("InIfName"),
        concat(lit("eth"), (col("event_id") % 3).cast("string")).as("OutIfName"),
        lit("uplink").as("InIfDescription"),
        lit("downlink").as("OutIfDescription"),
        lit(1000L).as("InIfSpeed"), lit(1000L).as("OutIfSpeed"),
        lit("transit").as("InIfConnectivity"), lit("peering").as("OutIfConnectivity"),
        concat(lit("p"), (col("user_id") % 3).cast("string")).as("InIfProvider"),
        concat(lit("p"), (col("event_id") % 3).cast("string")).as("OutIfProvider"),
        when(col("user_id") % 2 === 0, "external").otherwise("internal")
          .as("InIfBoundary"),
        when(col("event_id") % 2 === 0, "external").otherwise("internal")
          .as("OutIfBoundary"),
        when(col("event_id") % 10 < 8, 2048L).otherwise(34525L).as("EType"),
        when(col("event_id") % 3 === 0, 6L).when(col("event_id") % 3 === 1, 17L)
          .otherwise(1L).as("Proto"),
        (lit(1024) + (col("event_id") % 5000).cast("int")).as("SrcPort"),
        when(col("event_id") % 4 === 0, 443).when(col("event_id") % 4 === 1, 80)
          .when(col("event_id") % 4 === 2, 53).otherwise(8080).cast("int")
          .as("DstPort"),
        (round(col("value") * 100).cast("long") + 40L).as("Bytes"),
        (get_json_object(col("props"), "$.k").cast("long") % 10 + 1).as("Packets"),
        lit(64L).as("ForwardingStatus"),
        when(col("user_id") % 2 === 0, "ingress").otherwise("egress")
          .as("FlowDirection"))
  }

  /** The DuckDB CTE mirroring [[flows]] for oracle SQL (binary address
    * columns omitted — oracle queries never project them).
    */
  val flowsSql: String =
    """SELECT ts AS TimeReceived, 1000 AS SamplingRate,
      |  'exp' || CAST(user_id % 8 AS VARCHAR) AS ExporterName,
      |  'grp' || CAST(user_id % 3 AS VARCHAR) AS ExporterGroup,
      |  'site' || CAST(user_id % 4 AS VARCHAR) AS ExporterSite,
      |  64496 + user_id % 20 AS SrcAS, 64496 + event_id % 32 AS DstAS,
      |  'net' || CAST(user_id % 5 AS VARCHAR) AS SrcNetName,
      |  'net' || CAST(event_id % 5 AS VARCHAR) AS DstNetName,
      |  ['US','FR','DE','JP'][CAST(user_id % 4 + 1 AS INT)] AS SrcCountry,
      |  ['US','FR','DE','JP'][CAST(event_id % 4 + 1 AS INT)] AS DstCountry,
      |  'eth' || CAST(event_id % 4 AS VARCHAR) AS InIfName,
      |  'eth' || CAST(event_id % 3 AS VARCHAR) AS OutIfName,
      |  'uplink' AS InIfDescription, 'downlink' AS OutIfDescription,
      |  'transit' AS InIfConnectivity, 'peering' AS OutIfConnectivity,
      |  'p' || CAST(user_id % 3 AS VARCHAR) AS InIfProvider,
      |  'p' || CAST(event_id % 3 AS VARCHAR) AS OutIfProvider,
      |  1000 AS InIfSpeed, 1000 AS OutIfSpeed,
      |  CASE WHEN user_id % 2 = 0 THEN 'external' ELSE 'internal' END AS InIfBoundary,
      |  CASE WHEN event_id % 2 = 0 THEN 'external' ELSE 'internal' END AS OutIfBoundary,
      |  CASE WHEN event_id % 10 < 8 THEN 2048 ELSE 34525 END AS EType,
      |  CASE WHEN event_id % 3 = 0 THEN 6 WHEN event_id % 3 = 1 THEN 17 ELSE 1 END AS Proto,
      |  1024 + event_id % 5000 AS SrcPort,
      |  CASE WHEN event_id % 4 = 0 THEN 443 WHEN event_id % 4 = 1 THEN 80
      |       WHEN event_id % 4 = 2 THEN 53 ELSE 8080 END AS DstPort,
      |  CAST(round(value*100) AS BIGINT) + 40 AS Bytes,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 + 1 AS Packets,
      |  64 AS ForwardingStatus,
      |  CASE WHEN user_id % 2 = 0 THEN 'ingress' ELSE 'egress' END AS FlowDirection
      |FROM events""".stripMargin

  /** Newest `ts` from parquet FOOTER statistics: the per-row-group max
    * of the column, read driver-side from file metadata — O(files)
    * footer reads, ZERO data pages. The unpartitioned twin of
    * `FlowStore.newest`'s latest-partition probe, so `Widgets.dataNow`
    * never falls back to a full-column MAX scan on plain-parquet stores
    * (at 100 TB that fallback reads the whole table to anchor a
    * 5-minute window). `ts` is an INT64 timestamp whose unit comes from
    * the file's own logical-type annotation (MILLIS/MICROS/NANOS — the
    * driver has shipped different encodings); the value returned
    * matches `max(TimeReceived)` exactly, including the nanos→micros
    * `div 1000` truncation [[graft.Tables.load]]'s rebuild applies.
    */
  def newestFromFooters(spark: SparkSession, dir: String): Option[Timestamp] = {
    // ANY failure degrades the WHOLE probe to None so the caller's
    // MAX-scan fallback runs: skipping just the broken file would be
    // worse than either outcome — if the half-written file is the
    // NEWEST one, a per-file skip returns a confidently-stale max and
    // nothing ever falls back
    try {
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) return None
      val status = fs.getFileStatus(root)
      val files =
        if (status.isDirectory)
          fs.listStatus(root).filter(_.getPath.getName.endsWith(".parquet")).toSeq
        else Seq(status)
      files.flatMap(readFooterMax(_, conf)).maxOption.map { micros =>
        Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  private def readFooterMax(f: org.apache.hadoop.fs.FileStatus,
      conf: org.apache.hadoop.conf.Configuration): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
    try {
        val footer = reader.getFooter
        // unit from the column's OWN annotation — assuming one encoding
        // silently lands 1970 or year-52k timestamps
        val toMicros: Long => Long = footer.getFileMetaData.getSchema
          .getColumns.asScala
          .find(_.getPath.toSeq == Seq("ts"))
          .map(_.getPrimitiveType.getLogicalTypeAnnotation) match {
          case Some(t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => _ * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => identity
              case LogicalTypeAnnotation.TimeUnit.NANOS => _ / 1000L
            }
          case _ => _ / 1000L // bare INT64: the nanos-as-long encoding
        }
      // a present `ts` chunk with MISSING/unusable statistics is a probe
      // FAILURE, not a skippable row group: if the stats-less file is the
      // newest one, silently dropping it returns a confidently-stale max
      // and the caller's MAX-scan fallback never runs — exactly what the
      // all-or-nothing contract above forbids. Throwing here lands in
      // newestFromFooters' NonFatal => None.
      footer.getBlocks.asScala.filter(_.getRowCount > 0).flatMap { b =>
        val c = b.getColumns.asScala.find(_.getPath.toDotString == "ts")
          .getOrElse(throw new IllegalStateException(
            s"${f.getPath}: row group without a ts column chunk"))
        val s: org.apache.parquet.column.statistics.Statistics[_] =
          Option(c.getStatistics).filter(!_.isEmpty)
            .getOrElse(throw new IllegalStateException(
              s"${f.getPath}: ts column chunk without statistics"))
        if (!s.hasNonNullValue) {
          // readable stats but no max value: legitimate only when the
          // group's ts values are ALL null (no max exists to miss)
          if (s.isNumNullsSet && s.getNumNulls == b.getRowCount) None
          else throw new IllegalStateException(
            s"${f.getPath}: ts statistics carry no max value")
        } else Some(toMicros(s.genericGetMax match {
          case l: java.lang.Long => l.longValue()
          case other => other.toString.toLong
        }))
      }.toSeq
    } finally reader.close()
  }

  /** Registered flow tables: the main table (lazy projection, fully
    * prunable) plus 1m/5m/1h rollups *materialized* through [[FlowStore]]
    * exactly once per session — the reference's rollup tables are
    * materialized views, not per-query re-aggregations. Rollup queries
    * then scan time-partitioned parquet (column pruning + pushdown reach
    * the files) and every reader still re-aggregates (SummingMergeTree
    * merge-on-read semantics).
    */
  def tables(spark: SparkSession, dir: String): Seq[FlowTable] = {
    val main = flows(spark, dir)
    val oldest = Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val mainOnly = graft.schema.FlowSchema.schema.columns
      .filter(_.mainOnly).map(_.name).toSet
    // Lazy rollup views over the events mapping: truncate TimeReceived to
    // the resolution and drop main-only columns — NO pre-aggregation.
    // Every query over a SummingMergeTree-style rollup must re-aggregate
    // anyway (merge state is undefined in the reference, so only summable
    // measures are well-defined on rollups), and sums are associative, so
    // a pre-aggregation shuffle here adds zero information — it would
    // re-shuffle ~30 grouping columns per query for nothing. The
    // materialized production path (real traffic, where buckets actually
    // reduce) is [[FlowStore]]: parquet rollup tables partitioned by
    // p_date, maintained incrementally by [[graft.streaming.FlowIngest]].
    def rollup(sec: Long): DataFrame =
      main.select(main.columns.filterNot(mainOnly).map(col).toIndexedSeq: _*)
        .withColumn("TimeReceived",
          timestamp_seconds(floor(unix_timestamp(col("TimeReceived")) / sec) * sec))
    Seq(
      FlowTable("flows", 0L, oldest, () => main,
        newestHint = Some(() => newestFromFooters(spark, dir))),
      FlowTable("flows_1m", 60L, oldest, () => rollup(60)),
      FlowTable("flows_5m", 300L, oldest, () => rollup(300)),
      FlowTable("flows_1h", 3600L, oldest, () => rollup(3600)))
  }
}
