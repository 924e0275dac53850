package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY.md §2.11 "custom state" path):
  * per-entity sessionization with `flatMapGroupsWithState`. A session
  * closes when a same-user event arrives past the gap (emitted
  * immediately) or when the event-time watermark passes the session end +
  * gap (timeout emission). State per key is one small case class; work
  * distributes across the groupBy shuffle like any keyed aggregation.
  */
object Sessionize {

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(startMs: Long, endMs: Long, n: Long)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  def sessions(events: Dataset[Ev], gapMinutes: Int): Dataset[Session] = {
    val gapMs = gapMinutes * 60L * 1000L
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]

    def close(user: Long, s: SessionState): Session =
      Session(user, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n)

    def fn(user: Long, events: Iterator[Ev], state: GroupState[SessionState])
        : Iterator[Session] = {
      if (state.hasTimedOut) {
        val closed = state.getOption.map(close(user, _))
        state.remove()
        closed.iterator
      } else {
        val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        var emitted = List.empty[Session]
        var st = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          st = st match {
            case Some(s) if t - s.endMs <= gapMs =>
              Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
            case Some(s) =>
              emitted ::= close(user, s)
              Some(SessionState(t, t, 1))
            case None => Some(SessionState(t, t, 1))
          }
        }
        st.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
        emitted.reverseIterator
      }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
