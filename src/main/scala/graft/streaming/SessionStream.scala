package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the continuous flavor of the
  * q15 batch operator, built on `flatMapGroupsWithState` (the custom-
  * state API the rest of the streaming layer deliberately avoids in
  * favor of persisted tables; HERE the state is genuinely per-key and
  * tiny, which is exactly what the state store is for).
  *
  * A session closes when a gap longer than `gapUs` separates two
  * events of the same user (emitted immediately, mid-batch) or when
  * the event-time watermark passes the open session's last event plus
  * the gap (emitted via EventTimeTimeout — no new event needed).
  *
  * Scale shape: state per active user is O(1) — start, last-seen,
  * count, micro-unit sum — independent of event volume; the shuffle is
  * keyed by user exactly like the batch window. Within a micro-batch
  * the iterator is sorted by (ts, event_id) — the repo-wide unique-id
  * ordering contract — before folding, so results are deterministic
  * and, for in-order input, byte-identical to the batch q15 aggregate
  * (value sums use the same integer micro-unit trick as moneySum).
  */
object SessionStream {

  final case class SessionEvent(user_id: Long, event_id: Long,
      ts: Timestamp, value: Double)

  final case class OpenSession(start_us: Long, last_us: Long,
      n_events: Long, sum_micro: Long)

  final case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, sum_value: Double)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  private def close(uid: Long, s: OpenSession): Session =
    Session(uid, s.start_us, s.last_us, s.n_events, s.sum_micro / 1e6)

  private def fold(uid: Long, events: Iterator[SessionEvent], gapUs: Long,
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val done = close(uid, state.get)
      state.remove()
      Iterator(done)
    } else {
      val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val out = Seq.newBuilder[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val us = micros(e.ts)
        val v = math.round(e.value * 1e6)
        cur match {
          case Some(s) if us - s.last_us > gapUs =>
            out += close(uid, s)
            cur = Some(OpenSession(us, us, 1L, v))
          case Some(s) =>
            cur = Some(OpenSession(s.start_us, math.max(s.last_us, us),
              s.n_events + 1L, s.sum_micro + v))
          case None =>
            cur = Some(OpenSession(us, us, 1L, v))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last_us / 1000L + gapUs / 1000L)
      }
      out.result().iterator
    }
  }

  /** Sessionize a (possibly streaming) event Dataset. The caller's
    * watermark delay decides how much event-time disorder is tolerated;
    * events older than the watermark are dropped by the engine before
    * they reach the state function.
    */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) => fold(uid, it, gapUs, state)
      }
  }
}
