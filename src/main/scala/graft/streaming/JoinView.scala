package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incrementally maintained JOIN view (SURVEY.md §2.3 #85): materialize the
  * equi-join of TWO changefeeds and emit the joined view's own changefeed —
  * the Materialize/Kafka-Streams "table ⋈ table" semantic:
  *
  *  - a key joins when BOTH sides hold a live row → `upsert` with both
  *    payloads;
  *  - an update on either side re-emits the joined row;
  *  - a delete on either side (or a side going stale-dead) RETRACTS the
  *    joined row → `delete`;
  *  - batches that leave the joined row unchanged emit nothing (minimal
  *    changefeed).
  *
  * State is one [[JoinPairState]] per key — the latest row of each side
  * plus whether the join was last emitted — sharded by key hash like every
  * other keyed fold here, so a 100 TB join view is as partitionable as its
  * inputs. Per-side ordering is the same batching-invariant `(tsUs, seq)`
  * order as [[CdcMaterializer]], applied independently per side (each side
  * is its own changefeed with its own LSNs).
  */
object JoinView {

  /** A change tagged with which feed it came from ("L"/"R"). */
  case class Sided(side: String, op: String, key: Long, ts: java.sql.Timestamp, payload: Map[String, String], seq: Long)

  /** Latest state of one side of the pair. */
  case class SideState(tsUs: Long, seq: Long, payload: Map[String, String], deleted: Boolean)

  case class JoinPairState(left: Option[SideState], right: Option[SideState], joined: Boolean)

  /** One change of the joined view's changefeed. */
  case class JoinedChange(
      op: String,
      key: Long,
      l_payload: Map[String, String],
      r_payload: Map[String, String],
      tsUs: Long,
      seq: Long,
  )

  /** Per-key fold. Exposed for direct unit exercise. */
  def fold(key: Long, changes: Iterator[Sided], state: GroupState[JoinPairState]): Iterator[JoinedChange] = {
    val s0 = state.getOption.getOrElse(JoinPairState(None, None, joined = false))
    var l  = s0.left
    var r  = s0.right
    changes.toSeq.sortBy(c => (CdcMaterializer.micros(c.ts), c.seq)).foreach { c =>
      val tsUs = CdcMaterializer.micros(c.ts)
      val cur  = if (c.side == "L") l else r
      if (!cur.exists(s => CdcMaterializer.isStale(s.tsUs, s.seq, tsUs, c.seq))) {
        val next = Some(SideState(
          tsUs, c.seq,
          if (c.op == "delete") Map.empty else c.payload,
          c.op == "delete"))
        if (c.side == "L") l = next else r = next
      }
    }
    val liveL = l.filter(!_.deleted)
    val liveR = r.filter(!_.deleted)
    // the triggering commit position: the max position across both sides
    val (posTs, posSeq) = (l.toSeq ++ r.toSeq)
      .map(s => (s.tsUs, s.seq))
      .maxOption
      .getOrElse((0L, 0L))
    val prevPair = (s0.left.filter(!_.deleted).map(_.payload), s0.right.filter(!_.deleted).map(_.payload))
    val nowPair  = (liveL.map(_.payload), liveR.map(_.payload))
    val joined   = liveL.nonEmpty && liveR.nonEmpty
    val out =
      if (joined && (!s0.joined || prevPair != nowPair))
        Iterator.single(JoinedChange("upsert", key, liveL.get.payload, liveR.get.payload, posTs, posSeq))
      else if (!joined && s0.joined)
        Iterator.single(JoinedChange("delete", key, Map.empty, Map.empty, posTs, posSeq))
      else Iterator.empty
    state.update(JoinPairState(l, r, joined))
    out
  }

  /** Wire the fold over two streaming changefeeds. Append mode: the
    * emissions are the joined view's changefeed (events, not state), so
    * any downstream transform — including [[CdcMaterializer]]-style
    * re-materialization or a streaming aggregate — composes.
    */
  def materializeJoin(left: Dataset[Change], right: Dataset[Change]): Dataset[JoinedChange] = {
    implicit val sidedEnc  = Encoders.product[Sided]
    implicit val stateEnc  = Encoders.product[JoinPairState]
    implicit val joinedEnc = Encoders.product[JoinedChange]
    implicit val longEnc   = Encoders.scalaLong
    val tagged = left
      .map(c => Sided("L", c.op, c.key, c.ts, c.payload, c.seq))
      .union(right.map(c => Sided("R", c.op, c.key, c.ts, c.payload, c.seq)))
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }

  val outputMode: OutputMode = OutputMode.Append()
}
