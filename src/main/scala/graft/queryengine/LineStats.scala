package graft.queryengine

import org.apache.spark.sql.DataFrame

/** One output row of the line graph after driver-side post-processing
  * (reference `console/line.go:261-461`).
  */
final case class LineSeries(
    axis: Int,
    dimensions: Seq[String],
    points: Seq[Double],
    average: Double,
    min: Double,
    max: Double,
    last: Double,
    p95: Double,
    total: Double = 0.0)

/** Driver-side stats over the collected points — ≤ rows×2000 values, kept on
  * the driver exactly like the reference (reference `console/line.go:390-446`):
  * avg, min (nonzero), max, last (-2 index), 95th percentile with linear
  * interpolation.
  */
object LineStats {

  def collect(df: DataFrame, limitType: String = "avg"): Seq[LineSeries] = {
    val rows = df.collect()
    val times = rows.map(_.getAs[Long]("time_s")).distinct.sorted
    val timeIndex = times.zipWithIndex.toMap
    rows.groupBy(r => (r.getAs[Int]("axis"), r.getSeq[String](r.fieldIndex("dimensions"))))
      .map { case ((axis, dims), rs) =>
        val points = Array.fill(times.length)(0.0)
        rs.foreach { r =>
          points(timeIndex(r.getAs[Long]("time_s"))) = r.getAs[Double]("xps")
        }
        // total = sum x interval, interval derived from the returned time
        // axis exactly like the reference (line.go:373-375)
        val intervalSec = if (times.length >= 2) times(1) - times(0) else 0L
        build(axis, dims, points.toIndexedSeq, intervalSec)
      }
      .toSeq
      // "Other" rows (first dimension) forced last, then descending by the
      // limitType's metric (reference line.go:344-361: sum for avg, max for
      // max, final point for last)
      .sortBy { s =>
        val metric = limitType match {
          case "max" => s.max
          // sort metric is the FINAL point (the displayed `last` is the
          // second-to-last, since the final bucket is usually partial)
          case "last" => s.points.lastOption.getOrElse(0.0)
          case _ => s.average
        }
        (s.axis, s.dimensions.headOption.contains("Other"), -metric)
      }
  }

  def build(axis: Int, dims: Seq[String], points: Seq[Double],
      intervalSec: Long = 0L): LineSeries = {
    val n = points.length
    val avg = if (n == 0) 0.0 else points.sum / n
    val nonzero = points.filter(_ != 0.0)
    val minNz = if (nonzero.isEmpty) 0.0 else nonzero.min
    val maxV = if (points.isEmpty) 0.0 else points.max
    // last = points[-2]: the final bucket is usually partial (line.go:436-440)
    val last = if (n >= 2) points(n - 2) else if (n == 1) points(0) else 0.0
    LineSeries(axis, dims, points, avg, minNz, maxV, last,
      percentile(points, 0.95), points.sum * intervalSec)
  }

  /** Axis display names (reference line.go:449-459): Direct / Reverse /
    * "Previous <period>" with the period chosen by range length.
    */
  def axisName(axis: Int, rangeSec: Long): String = axis match {
    case 1 => "Direct"
    case 2 => "Reverse"
    case _ => "Previous " + periodName(rangeSec)
  }

  /** nearestPeriod display name (reference line.go:55-72). */
  def periodName(rangeSec: Long): String =
    if (rangeSec < 2 * 3600) "hour"
    else if (rangeSec < 2 * 86400) "day"
    else if (rangeSec < 2 * 7 * 86400) "week"
    else if (rangeSec < 2 * 4 * 7 * 86400) "month"
    else "year"


  /** 95th percentile with linear interpolation between closest ranks
    * (reference `console/line.go:415-430`).
    */
  def percentile(points: Seq[Double], q: Double): Double = {
    if (points.isEmpty) return 0.0
    val sorted = points.sorted
    val rank = q * (sorted.length - 1)
    val lo = math.floor(rank).toInt
    val hi = math.ceil(rank).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
  }
}
