package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the stateful twin of [[graft.analytics.Funnel]]:
  * stage-completion events ("user 42 just reached stage 3") emitted as
  * they happen, instead of a batch recount of the whole event log per
  * report. At 100 TB-stream scale the batch funnel answers "how many
  * converted", this answers "who just converted" with per-user state of
  * exactly one timestamp per completed stage — the same
  * activity-independent bound as the batch formulation, carried across
  * micro-batches in the state store ([[EventSessionizer]] discipline).
  *
  * Semantics: greedy min-ts chaining. Within a micro-batch events are
  * folded in (ts, event_type) order, and the first qualifying occurrence
  * of the next expected stage advances the chain — over an event-time-
  * ordered stream this emits EXACTLY the batch chain (the first type-i
  * event after t_{i-1} in ascending-ts order is the min). The contract is
  * the sessionizer's: per-user event-time ordering across batches; an
  * event arriving after a later-ts event already advanced the chain does
  * not rewrite history (the emitted transition is a fact). An optional
  * conversion window drops late conversions exactly as the batch
  * `withinSeconds` does.
  */
object FunnelStream {

  case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)
  /** Completed-prefix timestamps (epoch millis), one per stage reached. */
  case class FunnelState(reachedMs: Seq[Long])
  /** One emitted transition per newly-reached stage. */
  case class StageReached(user_id: Long, stage: Int, event_type: String,
                          ts: Timestamp)

  /** Fold one micro-batch of a user's events into the chain state,
    * emitting a [[StageReached]] per stage the batch completed. */
  def updateState(stages: IndexedSeq[String], withinMs: Option[Long])(
      userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[StageReached] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
    var reached = state.getOption.map(_.reachedMs.toVector)
      .getOrElse(Vector.empty)
    val out = Seq.newBuilder[StageReached]
    sorted.foreach { e =>
      val next = reached.length
      if (next < stages.length && e.event_type == stages(next)) {
        val ms = e.ts.getTime
        val qualifies = next == 0 ||
          (ms > reached(next - 1) &&
            withinMs.forall(w => ms <= reached(next - 1) + w))
        if (qualifies) {
          reached = reached :+ ms
          out += StageReached(userId, next + 1, stages(next), e.ts)
        }
      }
    }
    if (reached.nonEmpty) state.update(FunnelState(reached))
    out.result().iterator
  }

  /** Wire the stateful fold into a streaming Dataset. Update mode: each
    * micro-batch appends the transitions it produced (a transition is
    * emitted exactly once — state only ever grows). */
  def transitions(events: Dataset[FunnelEvent], stages: Seq[String],
                  withinSeconds: Option[Long] = None)
      : Dataset[StageReached] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[StageReached]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        updateState(stages.toIndexedSeq, withinSeconds.map(_ * 1000L)))
  }
}
