package graft.queryengine

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.filter.FilterCompiler
import graft.schema.Schema

/** Sankey input (reference `console/sankey.go:127-179`): ≥1 dimension, no
  * time axis, weight = units ÷ observed time span.
  */
final case class SankeyInput(
    start: Timestamp,
    end: Timestamp,
    dimensions: Seq[String],
    limit: Int = 10,
    filter: String = "",
    unit: String = "l3bps",
    bidirectional: Boolean = false,
    truncateV4: Int = 32,
    truncateV6: Int = 128) {
  require(dimensions.nonEmpty, "sankey requires at least one dimension")
  require(limit >= 1 && limit <= 50, "limit must be in 1..50")
}

/** Sankey pipeline (reference `console/sankey.go:56-147`): per-dimension
  * "Other" folding via membership in each column's top set, GROUP BY the
  * folded dimension tuple, weight = SUM(unit) / (MAX(time)-MIN(time)).
  */
final class SankeyQuery(schema: Schema, tables: Seq[FlowTable]) {

  def build(spark: SparkSession, in: SankeyInput): DataFrame = {
    val compiled = if (in.filter.trim.isEmpty) None
      else Some(FilterCompiler.compile(schema, in.filter)
        .fold(e => throw e, identity))
    val mainRequired = compiled.exists(_.mainTableRequired) ||
      in.dimensions.exists(schema.isMainOnly)
    // routing with points fixed at 20 (reference sankey.go:127-134)
    val resolved = TableResolver.resolve(tables, in.start, in.end, 20, mainRequired)

    // source REPLACE (shared helper — see Schema.truncateDims): dimension
    // columns only, filter evaluated over the replaced source
    def truncated(df: DataFrame, dims: Seq[String]): DataFrame =
      schema.truncateDims(df, dims, in.truncateV4, in.truncateV6)
    val scan0 = resolved.table.scan(in.start, in.end)
      .where(col("TimeReceived") >= lit(in.start) && col("TimeReceived") < lit(in.end))
    val scanT = truncated(scan0, in.dimensions)
    val scan = compiled.map(_.predicate).fold(scanT)(scanT.where)
    val unit = Unit.fromName(in.unit)

    // Aggregate-first (summable units): ONE fact scan builds the raw-dims
    // partial aggregate carrying the weight sum and the time extrema;
    // ranking, the span scalar, and the folded direct axis all derive from
    // the persisted partial (recomputable lineage) instead of re-scanning
    // (integer weights, so
    // sum-of-partials is exact). Ratio units keep the two-scan shape.
    val perDims = unit.rowWeight.map { w =>
      graft.ScratchCache.persist(scan.groupBy(in.dimensions.map(col): _*)
        .agg(sum(w).as("w"),
          max(col("TimeReceived")).as("tmax"), min(col("TimeReceived")).as("tmin")))
    }

    // ONE collected job for both driver-side scalars: the top row tuples
    // (the `rows` CTE) and the observed-span scalar CTE (reference
    // sankey.go:110-118) union into a single bounded result
    val rankedPart = perDims.getOrElse(
        scan.groupBy(in.dimensions.map(col): _*).agg(unit.agg.as("w")))
      .orderBy(desc("w") +: in.dimensions.map(asc): _*)
      .limit(in.limit)
      .select(lit(1).as("k"),
        array(in.dimensions.map(schema.renderDim): _*).as("ds"),
        col("w").cast("double").as("w"))
    val spanPart = perDims match {
      case Some(p) => p.agg(
          (unix_timestamp(max(col("tmax"))) -
            unix_timestamp(min(col("tmin")))).cast("double").as("w"))
        .select(lit(0).as("k"), array().cast("array<string>").as("ds"), col("w"))
      case None => scan.agg(
          (unix_timestamp(max(col("TimeReceived"))) -
            unix_timestamp(min(col("TimeReceived")))).cast("double").as("w"))
        .select(lit(0).as("k"), array().cast("array<string>").as("ds"), col("w"))
    }
    val collected = rankedPart.unionAll(spanPart).collect()
    val ranked = collected.filter(_.getInt(0) == 1).map(_.getSeq[String](1))
    // per-column membership sets (reference uses IN (SELECT col FROM rows))
    val perColumnTop: Seq[Set[String]] = in.dimensions.indices
      .map(i => ranked.map(r => Option(r(i)).getOrElse("")).toSet)
    val spanSec = collected.find(_.getInt(0) == 0)
      .filterNot(_.isNullAt(2))
      .map(r => math.max(1L, r.getDouble(2).toLong))
      .getOrElse(1L)

    // fold one axis: read `srcCols(i)`, probe the DIRECT axis's membership
    // set for position i, output under the direct label `in.dimensions(i)`
    // (reference sankey.go:85-94: the reverse axis probes the same `rows`
    // CTE positionally)
    def foldAxis(axisScan: DataFrame, srcCols: Seq[String],
        aggExpr: org.apache.spark.sql.Column): DataFrame = {
      val folded = srcCols.zipWithIndex.foldLeft(axisScan) {
        case (d, (srcCol, i)) =>
          val members = perColumnTop(i)
          d.withColumn(in.dimensions(i) + "__out",
            if (members.isEmpty) lit("Other")
            else when(schema.renderDim(srcCol).isin(members.toSeq.map(lit): _*),
              schema.renderDim(srcCol)).otherwise(lit("Other")))
      }
      folded
        .groupBy(in.dimensions.map(d => col(d + "__out").as(d)): _*)
        .agg((aggExpr / spanSec).as("weight"))
        .withColumn("span_sec", lit(spanSec))
    }

    val direct = perDims match {
      case Some(p) => foldAxis(p, in.dimensions, sum(col("w")))
      case None => foldAxis(scan, in.dimensions, unit.agg)
    }
    if (!in.bidirectional)
      return direct.orderBy(desc("weight") +: in.dimensions.map(asc): _*)

    // reverse axis: swapped columns + swapped filter over the same range,
    // merged UNION ALL with an axis literal (reference sankey.go:139-147)
    val scanRev0 = resolved.table.scan(in.start, in.end)
      .where(col("TimeReceived") >= lit(in.start) && col("TimeReceived") < lit(in.end))
    val scanRevT = truncated(scanRev0, in.dimensions.map(schema.reverseName))
    val scanRev = compiled.map(_.reversePredicate).fold(scanRevT)(scanRevT.where)
    val reverse = foldAxis(scanRev,
      in.dimensions.map(schema.reverseName), unit.reversed.agg)
    direct.withColumn("axis", lit(1))
      .unionAll(reverse.withColumn("axis", lit(2)))
      .orderBy(asc("axis") +: desc("weight") +: in.dimensions.map(asc): _*)
  }

  /** Driver-side node/link construction (reference `sankey.go:197-273`):
    * consecutive dimension pairs become edges; duplicate edges sum.
    */
  def links(df: DataFrame, dimensions: Seq[String]): Seq[((String, String), Double)] = {
    val rows = df.collect()
    val acc = scala.collection.mutable.LinkedHashMap[(String, String), Double]()
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      dimensions.sliding(2).foreach {
        case Seq(a, b) =>
          val key = (s"$a: ${r.getAs[String](a)}", s"$b: ${r.getAs[String](b)}")
          acc(key) = acc.getOrElse(key, 0.0) + w
        case _ =>
      }
    }
    acc.toSeq.sortBy(-_._2)
  }
}
