package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A typed feed event for the transition view. */
case class TypedEvent(eventId: Long, key: Long, ts: Timestamp, eventType: String)

/** Per-key state: just the latest event's identity — O(1) per key. */
case class LastType(tsUs: Long, eventId: Long, eventType: String)

case class Step(key: Long, src: String, dst: String, tsUs: Long, eventId: Long)

/** #163: LIVE event-transition matrix — the streaming form of batch q78
  * (the Markov view a monitor watches, not recomputes):
  *
  *  - Stage 1 turns the feed into (src → dst) STEPS with per-key
  *    last-event state (one tiny record per key, state ∝ keys):
  *    append-mode flatMapGroupsWithState, batching-invariant because a
  *    key's steps are a pure function of its (tsUs, eventId) order —
  *    the same LSN-order contract the CDC fold rides.
  *  - Stage 2 keeps the running (src, dst) counts as a plain streaming
  *    aggregation OVER the steps: map-side combined, state ∝ types²,
  *    never ∝ events — the stateful-over-stateful composition Spark
  *    supports precisely because stage 1 is append-mode.
  *
  * At 100 TB-feed scale this is the only viable shape: the matrix is
  * maintained incrementally from O(keys) + O(types²) state; nothing
  * ever re-reads history.
  *
  * Idle-key state: one LastType record per key, forever — correct for a
  * changefeed whose keys stay live. A deployment with unbounded key
  * churn bounds it the way [[StateMaterializer.materializeExpiring]]
  * does: an event-time timer per key (last ts + TTL) evicting the
  * record, at the cost of missing a transition that spans longer than
  * the TTL — a documented trade, not a default.
  */
object TransitionView {

  def fold(key: Long, events: Iterator[TypedEvent], state: GroupState[LastType]): Iterator[Step] = {
    val ordered = events.toSeq.sortBy(e => (CdcMaterializer.micros(e.ts), e.eventId))
    var prev    = state.getOption
    val out     = Seq.newBuilder[Step]
    ordered.foreach { e =>
      val tsu = CdcMaterializer.micros(e.ts)
      prev.foreach(p => out += Step(key, p.eventType, e.eventType, tsu, e.eventId))
      prev = Some(LastType(tsu, e.eventId, e.eventType))
    }
    prev.foreach(state.update)
    out.result().iterator
  }

  /** The step stream: one row per observed transition, append-only. */
  def steps(events: Dataset[TypedEvent]): Dataset[Step] = {
    implicit val stEnc   = Encoders.product[LastType]
    implicit val stepEnc = Encoders.product[Step]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }

  /** The live matrix: running transition counts per (src, dst). */
  def matrix(events: Dataset[TypedEvent]): DataFrame =
    steps(events).groupBy("src", "dst").count()
}
