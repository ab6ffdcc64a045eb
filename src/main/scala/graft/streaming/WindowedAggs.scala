package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked streaming window aggregates (SURVEY.md §2.3 #33/#34/#35).
  *
  * The watermark bounds state: closed windows are finalized and evicted
  * once event time passes `watermark`, so state size is
  * O(open windows x groups), independent of stream length.
  */
object WindowedAggs {

  /** #33: tumbling 1 h windows per event type. */
  def tumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** #34: session windows — 30 min inactivity gap per user, native
    * `session_window` (state store merges adjacent sessions).
    */
  def sessions(events: DataFrame, gap: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total"))

  /** #35: streaming dedup — drop replayed event_ids within the watermark. */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
}
