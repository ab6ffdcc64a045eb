package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Incrementally maintained derived views (SURVEY.md §2.3 #39) — the core
  * changefeed-engine concept: a view defined over the feed whose groups
  * are updated in place as changes arrive, and whose per-batch output IS
  * the view's own changefeed (only the groups touched by the batch are
  * re-emitted in Update mode).
  *
  * State is Spark's streaming-aggregation store: one row per group,
  * updated by map-side-combined partial aggregates — the same incremental
  * maintenance a native changefeed engine does, with the state sharded
  * across executors.
  */
object IncrementalView {

  /** Live per-attribute aggregate over a Change stream: deletes retract
    * nothing here (append-only fold) but are excluded from the totals —
    * full retraction lives in [[CdcMaterializer]] + [[FeedSink]].
    * Input: a streaming DataFrame with the [[ChangeFeed.schema]] columns.
    */
  def liveTotals(changes: DataFrame, groupKey: String = "event_type"): DataFrame =
    changes
      .filter(col("op") =!= "delete")
      .groupBy(col("payload").getItem(groupKey).as(groupKey))
      .agg(
        count(lit(1)).as("n_changes"),
        sum(col("payload").getItem("value").cast("double")).as("total_value"),
      )

  val outputMode: OutputMode = OutputMode.Update()
}
