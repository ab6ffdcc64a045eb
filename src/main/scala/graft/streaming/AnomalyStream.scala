package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An event on the monitored feed. */
case class MetricEvent(eventId: Long, key: Long, ts: Timestamp, value: Double)

/** Per-key Welford running moments — O(1) state per key, mergeable only
  * sequentially (this is per-key ORDERED state, not a combine tree).
  */
case class KeyMoments(key: Long, n: Long, mean: Double, m2: Double)

case class AnomalyFlag(key: Long, eventId: Long, tsUs: Long, value: Double, z: Double, nPrior: Long)

/** #128: online per-key anomaly detection — the STREAMING form of the q51
  * batch query. Each arriving event is z-scored against the moments of the
  * key's PRIOR events only (then folded in), so the semantics are a pure
  * function of the per-key `(tsUs, eventId)` order: batching-invariant by
  * the same argument as the CDC fold, and flags never depend on data that
  * arrived after the event being judged (no look-ahead — what a live
  * monitor can actually know).
  *
  * State is three doubles per key (Welford mean/M2/count) in the keyed
  * state store; at 100 TB-scale feeds this is the only shape that works —
  * no window over history, no re-aggregation, state ∝ keys.
  */
object AnomalyStream {

  def fold(sigmas: Double, minPrior: Long)(
      key: Long,
      events: Iterator[MetricEvent],
      state: GroupState[KeyMoments]): Iterator[AnomalyFlag] = {
    val ordered = events.toSeq.sortBy(e => (CdcMaterializer.micros(e.ts), e.eventId))
    var st  = state.getOption.getOrElse(KeyMoments(key, 0L, 0.0, 0.0))
    val out = Seq.newBuilder[AnomalyFlag]
    ordered.foreach { e =>
      if (st.n >= minPrior) {
        val sd = math.sqrt(st.m2 / (st.n - 1).toDouble)
        if (sd > 0) {
          val z = (e.value - st.mean) / sd
          if (math.abs(z) > sigmas)
            out += AnomalyFlag(key, e.eventId, CdcMaterializer.micros(e.ts), e.value, z, st.n)
        }
      }
      val n1    = st.n + 1
      val d     = e.value - st.mean
      val mean1 = st.mean + d / n1.toDouble
      st = KeyMoments(key, n1, mean1, st.m2 + d * (e.value - mean1))
    }
    state.update(st)
    out.result().iterator
  }

  def flags(events: Dataset[MetricEvent], sigmas: Double = 3.0, minPrior: Long = 10L): Dataset[AnomalyFlag] = {
    implicit val momEnc  = Encoders.product[KeyMoments]
    implicit val flagEnc = Encoders.product[AnomalyFlag]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        fold(sigmas, minPrior))
  }
}
