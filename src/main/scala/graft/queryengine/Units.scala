package graft.queryengine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aggregation units (reference `console/clickhouse.go:186-199`; direction
  * swap `console/graph.go:31-40`).
  */
sealed abstract class Unit(val name: String) {
  /** the aggregate over the scanned rows */
  def agg: Column
  /** per-row integer weight, when the unit is a plain weighted sum — feeds
    * the topKWeighted sketch (reference `clickhouse.go:206-213` weight
    * expressions); None for units the sketch cannot rank (ratios).
    */
  def rowWeight: Option[Column] = None
  /** unit for the reverse-direction axis (In↔Out swap for l2% units) */
  def reversed: Unit = this
}

object Unit {
  case object Fps extends Unit("fps") {
    def agg: Column = count(lit(1))
    override def rowWeight: Option[Column] = Some(lit(1L))
  }
  case object Pps extends Unit("pps") {
    def agg: Column = sum(col("Packets") * col("SamplingRate"))
    override def rowWeight: Option[Column] =
      Some((col("Packets") * col("SamplingRate")).cast("long"))
  }
  case object L3Bps extends Unit("l3bps") {
    def agg: Column = sum(col("Bytes") * col("SamplingRate") * 8)
    override def rowWeight: Option[Column] =
      Some((col("Bytes") * col("SamplingRate") * 8).cast("long"))
  }
  /** Ethernet overhead model: +38 bytes per packet
    * (reference `clickhouse.go:189-194`).
    */
  case object L2Bps extends Unit("l2bps") {
    def agg: Column =
      sum((col("Bytes") + lit(38) * col("Packets")) * col("SamplingRate") * 8)
    override def rowWeight: Option[Column] = Some(
      ((col("Bytes") + lit(38) * col("Packets")) * col("SamplingRate") * 8)
        .cast("long"))
  }
  /** percent of interface speed; multi-arg count-distinct, NaN→0
    * (reference `clickhouse.go:195-199`).
    */
  final case class L2Percent(in: Boolean) extends Unit(if (in) "inl2%" else "outl2%") {
    private def speed = col(if (in) "InIfSpeed" else "OutIfSpeed")
    def agg: Column = nanvl(
      sum((col("Bytes") + lit(38) * col("Packets")) * col("SamplingRate") * 800 /
        (speed * 1e6)) /
        count_distinct(col("ExporterAddress"), col(if (in) "InIfName" else "OutIfName")),
      lit(0.0))
    override def reversed: Unit = L2Percent(!in)
  }

  def fromName(s: String): Unit = s match {
    case "fps" => Fps
    case "pps" => Pps
    case "l3bps" => L3Bps
    case "l2bps" => L2Bps
    case "inl2%" => L2Percent(true)
    case "outl2%" => L2Percent(false)
    case other => throw new IllegalArgumentException(s"unknown unit $other")
  }
}
