package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2 streaming surface;
  * the `flatMapGroupsWithState` pattern from the build guide): 30-minute-gap
  * sessions per user, state = (last event ts, session count, event count).
  *
  * This is the streaming twin of [[graft.analytics.Events.qSessions]] — the
  * batch version computes the same fold with a lag window; the streaming
  * version carries it across micro-batches in the state store, which is the
  * 100 TB-stream answer: per-key state is O(1), not O(history).
  */
object EventSessionizer {

  case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  /** lastTsSec = floor-seconds of the last event — the same truncation the
    * batch query's unix_timestamp() applies, so gaps agree exactly. */
  case class SessionState(lastTsSec: Long, nSessions: Long, nEvents: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  val GapSeconds = 1800L

  /** Fold one micro-batch of a user's events into the running state.
    * Events within a batch are sorted by (ts, event_id) — the same total
    * order the batch oracle uses. */
  def updateState(userId: Long, events: Iterator[Event],
                  state: GroupState[SessionState]): Iterator[UserSessions] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val tsSec = Math.floorDiv(e.ts.getTime, 1000L)
      val newSession = s.lastTsSec == Long.MinValue ||
        tsSec - s.lastTsSec > GapSeconds
      s = SessionState(tsSec,
        s.nSessions + (if (newSession) 1L else 0L), s.nEvents + 1L)
    }
    state.update(s)
    Iterator.single(UserSessions(userId, s.nSessions, s.nEvents))
  }

  /** Wire the stateful fold into a streaming Dataset. Output mode Update:
    * one refreshed row per user per micro-batch. */
  def sessionize(events: Dataset[Event]): Dataset[UserSessions] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[UserSessions]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateState)
  }
}
