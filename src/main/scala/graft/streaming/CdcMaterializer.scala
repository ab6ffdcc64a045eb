package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Current materialized row for a key (the fold of its changefeed). */
case class KeyState(
    key: Long,
    tsUs: Long,
    payload: Map[String, String],
    deleted: Boolean,
)

/** CDC materialization (SURVEY.md §2.3 #32): fold a changefeed into
  * current-state rows with last-writer-wins upsert/delete semantics.
  *
  * State lives in Spark's keyed state store — one entry per live key,
  * partitioned by key hash, so state size scales with key cardinality and
  * executors, never with feed length. Out-of-order changes are resolved by
  * commit timestamp: a stale change (older ts than the state) is ignored.
  * Emitted rows are the post-batch state (Update output mode), i.e. the
  * materialized view's own changefeed.
  */
object CdcMaterializer {

  /** Full-precision commit time: java.sql.Timestamp.getTime is only
    * ms-accurate, which would make sub-ms changes tie (and stale-detection
    * blind) on high-rate feeds; getNanos carries the rest.
    */
  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** The per-group fold. Exposed for direct unit exercise. */
  def fold(key: Long, changes: Iterator[Change], state: GroupState[KeyState]): Iterator[KeyState] = {
    val ordered = changes.toSeq.sortBy(c => (micros(c.ts), c.op))
    var cur = state.getOption
    ordered.foreach { c =>
      val tsUs = micros(c.ts)
      val stale = cur.exists(_.tsUs > tsUs)
      if (!stale) {
        cur = c.op match {
          case "delete" => Some(KeyState(key, tsUs, Map.empty, deleted = true))
          case _        => Some(KeyState(key, tsUs, c.payload, deleted = false))
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

  val outputMode: OutputMode = OutputMode.Update()
}
