package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admission decision on the ingest feed. */
case class Admission(key: Long, eventId: Long, tsUs: Long, admitted: Boolean, tokensAfter: Double)

/** Per-key token-bucket state: current tokens + the event time they were
  * computed at.
  */
case class Bucket(key: Long, tokens: Double, asOfUs: Long)

/** #132: per-key token-bucket admission control — the quota/rate-limit
  * stage an ingest engine runs before expensive downstream operators
  * (a key emitting faster than its budget gets tagged, not the fleet).
  *
  * Refill accrues in EVENT time (`perSec` tokens/sec up to `capacity`),
  * so the decision sequence is a pure fold of each key's
  * `(tsUs, eventId)`-ordered events — batching-invariant by the CDC-fold
  * argument, replayable, and independent of wall-clock processing lag.
  * A straggler older than the bucket's as-of position accrues no refill
  * (dt clamps to 0) but still draws a token: late traffic never
  * manufactures budget. State is two numbers per key.
  */
object RateLimiter {

  def fold(capacity: Double, perSec: Double)(
      key: Long,
      events: Iterator[MetricEvent],
      state: GroupState[Bucket]): Iterator[Admission] = {
    val ordered = events.toSeq.sortBy(e => (CdcMaterializer.micros(e.ts), e.eventId))
    var st  = state.getOption.getOrElse(Bucket(key, capacity, Long.MinValue))
    val out = Seq.newBuilder[Admission]
    ordered.foreach { e =>
      val tsUs = CdcMaterializer.micros(e.ts)
      val dtUs = if (st.asOfUs == Long.MinValue) 0L else math.max(0L, tsUs - st.asOfUs)
      val filled = math.min(capacity, st.tokens + dtUs / 1e6 * perSec)
      val admitted = filled >= 1.0
      val after = if (admitted) filled - 1.0 else filled
      out += Admission(key, e.eventId, tsUs, admitted, after)
      st = Bucket(key, after, math.max(st.asOfUs, tsUs))
    }
    state.update(st)
    out.result().iterator
  }

  def admissions(events: Dataset[MetricEvent], capacity: Double = 5.0, perSec: Double = 1.0): Dataset[Admission] = {
    implicit val bucketEnc = Encoders.product[Bucket]
    implicit val admEnc    = Encoders.product[Admission]
    implicit val longEnc   = Encoders.scalaLong
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        fold(capacity, perSec))
  }
}
