package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.sketch.Kmv

/** Continuously-maintained distinct-count sketches — the streaming twin
  * of [[graft.operators.sketch.Kmv]] (the batch/rollup path over the
  * same 48-bit hashes): per (group, tumbling window), the state store
  * keeps the k smallest distinct value hashes, and every micro-batch
  * emits the window's refreshed estimate. This is the
  * materialized-view discipline ClickHouse's `uniqCombinedState` MVs
  * apply to distinct counts: the estimate is always current while the
  * stream runs, and the final per-window row (the last emitted) matches
  * the batch sketch of the same data bit-for-bit — same hash, same
  * integer estimator, so the nightly batch pass confirms rather than
  * corrects.
  *
  * Scale shape: state per (group, window) is ≤ k longs — bounded by the
  * number of ACTIVE windows, not stream history — and expires by
  * event-time timeout once the watermark passes the window's horizon.
  * Each sketch lives where its (group, window) key hashes; no shuffle
  * beyond the groupBy's own.
  */
object StreamKmv {

  final case class HashRow(g: String, win_start: Timestamp, ts: Timestamp,
      h: Long)

  /** Sketch state: ascending k-min hashes + newest event time (expiry). */
  final case class SketchState(hashes: Array[Long], lastTsMs: Long)

  final case class Estimate(g: String, win_start: Timestamp, n_kept: Int,
      est_distinct: Long)

  private def estimateOf(k: Int, hashes: Array[Long]): Long =
    if (hashes.length < k) hashes.length.toLong
    else (k - 1).toLong * Kmv.HashSpace / hashes.last

  private def fold(k: Int, horizonMs: Long)(
      key: (String, Timestamp),
      rows: Iterator[HashRow],
      state: GroupState[SketchState]): Iterator[Estimate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val prev = state.getOption.map(_.hashes).getOrElse(Array.empty[Long])
    var lastTs = state.getOption.map(_.lastTsMs).getOrElse(0L)
    // merge = union + re-truncate, the same operation Kmv.mergeAll does
    // relationally; the sorted-array form keeps it O((k + batch) log ·)
    val merged = scala.collection.mutable.SortedSet[Long](prev: _*)
    rows.foreach { r =>
      lastTs = math.max(lastTs, r.ts.getTime)
      merged += r.h
      if (merged.size > k) merged -= merged.last
    }
    val hashes = merged.toArray
    state.update(SketchState(hashes, lastTs))
    state.setTimeoutTimestamp(lastTs + horizonMs)
    Iterator.single(Estimate(key._1, key._2, hashes.length,
      estimateOf(k, hashes)))
  }

  /** Per-(group, tumbling-window) distinct estimates from a streaming
    * DataFrame, refreshed every micro-batch. `valueCol` nulls are
    * excluded (COUNT DISTINCT semantics, the batch sketch's rule).
    */
  def estimates(stream: DataFrame, groupCol: String, valueCol: String,
      tsCol: String, k: Int, windowSec: Long = 60L,
      watermark: String = "10 minutes",
      horizonMs: Long = 600000L): Dataset[Estimate] = {
    require(k >= 2 && k <= 32768, s"KMV needs 2 <= k <= 32768 (got $k)")
    implicit val inEnc = Encoders.product[HashRow]
    implicit val outEnc = Encoders.product[Estimate]
    implicit val stateEnc = Encoders.product[SketchState]
    stream
      .where(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        window(col(tsCol), s"$windowSec seconds")("start").as("win_start"),
        col(tsCol).cast("timestamp").as("ts"),
        Kmv.portableHash48(col(valueCol)).as("h"))
      .withWatermark("ts", watermark)
      .as[HashRow]
      .groupByKey(r => (r.g, r.win_start))(
        Encoders.tuple(Encoders.STRING, Encoders.TIMESTAMP))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        fold(k, horizonMs))
  }
}
