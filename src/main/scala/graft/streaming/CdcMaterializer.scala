package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Current materialized row for a key (the fold of its changefeed).
  * `(tsUs, seq)` is the commit position of the winning change — kept in
  * state so stale-detection orders ties exactly like the in-batch fold.
  */
case class KeyState(
    key: Long,
    tsUs: Long,
    seq: Long,
    payload: Map[String, String],
    deleted: Boolean,
)

/** CDC materialization (SURVEY.md §2.3 #32): fold a changefeed into
  * current-state rows with last-writer-wins upsert/delete semantics.
  *
  * State lives in Spark's keyed state store — one entry per live key,
  * partitioned by key hash, so state size scales with key cardinality and
  * executors, never with feed length. Out-of-order changes are resolved by
  * commit position `(tsUs, seq)`: a stale change (older position than the
  * state) is ignored. Because both the in-batch sort and the stale check
  * use the same total order, the fold is batching-invariant — the same
  * feed materializes identically however the changes are micro-batched.
  * Emitted rows are the post-batch state (Update output mode), i.e. the
  * materialized view's own changefeed.
  */
object CdcMaterializer {

  /** Full-precision commit time: java.sql.Timestamp.getTime is only
    * ms-accurate, which would make sub-ms changes tie (and stale-detection
    * blind) on high-rate feeds; getNanos carries the rest.
    */
  private[streaming] def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** True iff state position `(sTs, sSeq)` is strictly after `(ts, seq)`. */
  private[streaming] def isStale(sTs: Long, sSeq: Long, ts: Long, seq: Long): Boolean =
    sTs > ts || (sTs == ts && sSeq > seq)

  /** The per-group fold. Exposed for direct unit exercise. */
  def fold(key: Long, changes: Iterator[Change], state: GroupState[KeyState]): Iterator[KeyState] = {
    val ordered = changes.toSeq.sortBy(c => (micros(c.ts), c.seq))
    var cur = state.getOption
    ordered.foreach { c =>
      val tsUs = micros(c.ts)
      val stale = cur.exists(s => isStale(s.tsUs, s.seq, tsUs, c.seq))
      if (!stale) {
        cur = c.op match {
          case "delete" => Some(KeyState(key, tsUs, c.seq, Map.empty, deleted = true))
          case _        => Some(KeyState(key, tsUs, c.seq, c.payload, deleted = false))
        }
      }
    }
    cur match {
      case Some(s) => state.update(s); Iterator.single(s)
      case None    => Iterator.empty
    }
  }

  /** Wire the fold over a streaming Dataset[Change]. Run with
    * `OutputMode.Update` ([[outputMode]]).
    */
  def materialize(changes: Dataset[Change]): Dataset[KeyState] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val longEnc  = Encoders.scalaLong
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold)
  }

  /** [[materialize]] bootstrapped from a batch snapshot — the
    * backfill/catch-up path: the batch engine materializes history (q21),
    * the streaming query starts FROM that state and applies only live
    * changes. Stale-drop works against the bootstrapped positions, so a
    * replayed change older than the snapshot's `(tsUs, seq)` is ignored
    * exactly as if the stream had been running all along — the kappa
    * handoff without reprocessing the feed's history.
    */
  def materializeFrom(
      initial: Dataset[KeyState],
      changes: Dataset[Change]): Dataset[KeyState] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val longEnc  = Encoders.scalaLong
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout(),
        initial.groupByKey(_.key))(fold)
  }

  /** [[fold]] plus tombstone expiry: a deleted key's state is only needed
    * to stale-drop stragglers, so once the event-time watermark passes
    * `delete ts + ttl` the tombstone is removed from the store — state
    * size is bounded by LIVE keys + recently-deleted ones, not by every
    * key ever deleted (on an unbounded feed the difference is the engine
    * staying up). The documented tradeoff of any tombstone GC: a change
    * for an expired key that arrives later than watermark+ttl
    * re-materializes the key as if new.
    */
  def foldExpiring(ttlMs: Long)(
      key: Long,
      changes: Iterator[Change],
      state: GroupState[KeyState]): Iterator[KeyState] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val out = fold(key, changes, state)
      state.getOption.foreach { s =>
        // timeout must sit beyond the current watermark or Spark rejects it
        if (s.deleted) state.setTimeoutTimestamp(
          math.max(s.tsUs / 1000L + ttlMs, state.getCurrentWatermarkMs + 1L))
      }
      out
    }
  }

  /** [[materialize]] with watermarked input and tombstone TTL (event-time
    * timeout). `watermarkDelay` bounds how late a change may arrive;
    * `tombstoneTtl` how long a delete keeps stale-dropping stragglers.
    */
  def materializeExpiring(
      changes: Dataset[Change],
      watermarkDelay: String = "10 minutes",
      tombstoneTtlMs: Long = 10L * 60 * 1000): Dataset[KeyState] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val longEnc  = Encoders.scalaLong
    changes
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        foldExpiring(tombstoneTtlMs))
  }

  val outputMode: OutputMode = OutputMode.Update()
}
