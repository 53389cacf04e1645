package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the continuous twin of
  * [[graft.operators.session.Sessionize]] (which is the batch
  * backfill/replay path over the same semantics): per-user sessions split
  * at inactivity gaps, emitted as they CLOSE.
  *
  * Spark shape: `flatMapGroupsWithState` keyed by user with an
  * EVENT-TIME timeout. The only state per user is the open session
  * (4 longs); a session closes either inline — a newer event arrives more
  * than `gapSec` after the previous one — or by timeout when the
  * watermark passes the open session's gap horizon, which also clears the
  * state. State is therefore bounded by the number of users active
  * within one gap+watermark window, not by stream history; a
  * 1000-executor cluster holds each user's open session exactly where
  * that user's events hash. Late events beyond the watermark are dropped
  * by the engine before the function runs (standard watermark
  * discipline).
  *
  * Sessions are identified by (user_id, start_s) — stable under
  * restarts, unlike a per-user running index, which would have to live in
  * state forever to survive timeouts. Timestamps are whole epoch
  * seconds, matching the batch operator.
  */
object StreamSession {

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long)

  /** Open-session state: [startS, lastS] span and event count. */
  final case class OpenSession(startS: Long, lastS: Long, nEvents: Long)

  final case class ClosedSession(user_id: Long, start_s: Long, end_s: Long,
      n_events: Long, duration_s: Long)

  private def fold(gapSec: Long)(
      user: Long,
      rows: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    def close(s: OpenSession): ClosedSession =
      ClosedSession(user, s.startS, s.lastS, s.nEvents, s.lastS - s.startS)
    if (state.hasTimedOut) {
      // watermark passed the open session's gap horizon: final close
      val out = state.getOption.map(close).iterator
      state.remove()
      return out
    }
    val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
    var open = state.getOption.orNull
    // groups carry no row order — sort by (second, tiebreak) like the
    // batch operator
    rows.toSeq.sortBy(e => (e.ts.getTime / 1000, e.event_id)).foreach { e =>
      val es = e.ts.getTime / 1000
      open match {
        case null => open = OpenSession(es, es, 1L)
        case s if es - s.lastS > gapSec =>
          out += close(s)
          open = OpenSession(es, es, 1L)
        case s =>
          // events at or before lastS only bump the count (a same-second
          // or in-batch-reordered arrival never reopens a closed span)
          open = s.copy(lastS = math.max(s.lastS, es), nEvents = s.nEvents + 1L)
      }
    }
    state.update(open)
    state.setTimeoutTimestamp((open.lastS + gapSec) * 1000L + 999L)
    out.iterator
  }

  /** Sessionizes an event stream; requires `withWatermark` to have been
    * set upstream on the event-time column (the timeout horizon rides the
    * watermark).
    */
  def sessionize(stream: Dataset[SessionEvent],
      gapSec: Long): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    stream
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold(gapSec))
  }
}
