package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key one-sided CUSUM state: the running statistic plus the audit
  * counters a monitor reports. O(1) per key — the whole point of CUSUM as
  * a STREAMING statistic (Page 1954 designed it for exactly this: no
  * window over history, one register per monitored series).
  */
case class CusumState(key: String, nTotal: Long, s: Long, maxS: Long, alarms: Long, firstAlarmUs: Long)

case class CusumEvent(key: String, eventId: Long, ts: Timestamp, v4: Long)

/** One row per (key, batch) with the monitor's current posture; nTotal
  * is cumulative, so the max-nTotal row per key is the latest posture.
  */
case class CusumReport(key: String, nTotal: Long, s: Long, maxS: Long,
    alarms: Long, firstAlarmUs: Long)

/** #336: LIVE CUSUM drift detection — the streaming form of the q128
  * batch query (the q51↔#128 / q78↔#163 batch↔stream pairing applied to
  * changepoint monitoring). The recursion S ← max(0, S + x − μ − k) folds
  * ONE register per key in the state store; alarms fire the moment S
  * crosses h, not at the end of a scan.
  *
  * The reference level μ (and slack k, threshold h, all e4 fixed point)
  * is supplied by the caller — in production the baseline comes from a
  * trained reference window (q128's batch pass over history IS that
  * trainer), never from the live stream itself (a drifting stream would
  * re-center its own alarm away).
  *
  * Semantics are a pure function of the per-key (ts, eventId) order —
  * each micro-batch's group is sorted before folding (bounded by the
  * batch, not history), so in-order delivery reproduces the q128 batch
  * closed form EXACTLY (spec'd: same alarms, same max, same first-alarm
  * time, across any micro-batch split). Late/out-of-order data shifts
  * the fold like any sequential monitor; the batch q128 over the sealed
  * history is the reconciliation answer.
  */
object DriftStream {

  private val noAlarm = -1L

  def fold(mu4: Map[String, Long], k4: Long, h4: Long)(
      key: String,
      events: Iterator[CusumEvent],
      state: GroupState[CusumState]): Iterator[CusumReport] = {
    val ordered = events.toSeq.sortBy(e => (CdcMaterializer.micros(e.ts), e.eventId))
    var st = state.getOption.getOrElse(CusumState(key, 0L, 0L, 0L, 0L, noAlarm))
    val mu = mu4.getOrElse(key, 0L)
    ordered.foreach { e =>
      val s1 = math.max(0L, st.s + e.v4 - mu - k4)
      val crossed = s1 > h4
      st = CusumState(key, st.nTotal + 1L, s1, math.max(st.maxS, s1),
        st.alarms + (if (crossed) 1L else 0L),
        if (crossed && st.firstAlarmUs == noAlarm) CdcMaterializer.micros(e.ts)
        else st.firstAlarmUs)
    }
    state.update(st)
    Iterator.single(CusumReport(key, st.nTotal, st.s, st.maxS, st.alarms, st.firstAlarmUs))
  }

  def monitor(events: Dataset[CusumEvent], mu4: Map[String, Long],
      k4: Long = 100000L, h4: Long = 2000000L): Dataset[CusumReport] = {
    implicit val stEnc  = Encoders.product[CusumState]
    implicit val repEnc = Encoders.product[CusumReport]
    implicit val strEnc = Encoders.STRING
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        fold(mu4, k4, h4))
  }
}
