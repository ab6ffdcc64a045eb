package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY.md §2.3 #38).
  *
  * Both sides carry watermarks and the join condition bounds event time on
  * both sides, so Spark can evict join state: each side buffers only rows
  * inside the watermark + interval horizon — the requirement for an
  * unbounded changefeed join to run forever in bounded memory.
  */
object StreamJoins {

  /** Purchases attributed to a signup on the same user within `horizon`.
    * Inputs: signups(s_user, s_ts), purchases(p_user, p_ts, p_value).
    */
  def purchaseAttribution(
      signups: DataFrame,
      purchases: DataFrame,
      horizon: String = "1 hour",
      watermark: String = "10 minutes",
  ): DataFrame =
    signups
      .withWatermark("s_ts", watermark)
      .join(
        purchases.withWatermark("p_ts", watermark),
        expr(s"s_user = p_user AND p_ts >= s_ts AND p_ts <= s_ts + interval $horizon"),
      )

  /** LEFT OUTER variant: every signup eventually emits — joined rows as
    * matches arrive, and an unmatched signup with NULL purchase columns
    * once the watermark passes its horizon (Spark can only then prove no
    * match can still arrive; outer results are inherently
    * watermark-delayed). This is the "did the user ever convert?"
    * changefeed, including the negatives.
    */
  def purchaseAttributionOuter(
      signups: DataFrame,
      purchases: DataFrame,
      horizon: String = "1 hour",
      watermark: String = "10 minutes",
  ): DataFrame =
    signups
      .withWatermark("s_ts", watermark)
      .join(
        purchases.withWatermark("p_ts", watermark),
        expr(s"s_user = p_user AND p_ts >= s_ts AND p_ts <= s_ts + interval $horizon"),
        "leftOuter",
      )

  /** FULL OUTER variant: the symmetric completion — unmatched rows from
    * BOTH sides emit with NULLs once the watermark proves no partner can
    * arrive. Signups that never converted AND purchases with no preceding
    * signup (organic/attribution-lost traffic) both appear, so the join's
    * output is a complete account of both feeds.
    */
  def purchaseAttributionFullOuter(
      signups: DataFrame,
      purchases: DataFrame,
      horizon: String = "1 hour",
      watermark: String = "10 minutes",
  ): DataFrame =
    signups
      .withWatermark("s_ts", watermark)
      .join(
        purchases.withWatermark("p_ts", watermark),
        expr(s"s_user = p_user AND p_ts >= s_ts AND p_ts <= s_ts + interval $horizon"),
        "fullOuter",
      )

  /** THREE-way stream-stream interval join (SURVEY.md §2.3 #175): the
    * view→click→purchase attribution chain, as two CHAINED watermarked
    * interval joins — Spark plans exactly two StreamingSymmetricHashJoin
    * operators, the first's output feeding the second as a derived
    * stream (no intermediate materialization, one continuous query).
    *
    * State bounds, per the interval-join eviction rule (each side keeps
    * rows until the watermark passes their last possible partner):
    *  - join 1 buffers views for `horizon1` + clicks for watermark lag;
    *  - join 2 buffers view⋈click pairs for `horizon2` past c_ts, and
    *    purchases for the watermark lag —
    * so total state ≈ rate × (horizon1 + horizon2 + 2·watermark) rows
    * per side, CONSTANT in stream length: the 3-way chain runs forever
    * in bounded memory exactly like each pairwise join. Event-time
    * bounds on every pair (c in [v, v+h1], p in [c, c+h2]) are what
    * make that eviction provable for both hops; a key-only 3-way join
    * would buffer forever.
    *
    * Inputs: views(v_user, v_ts), clicks(c_user, c_ts),
    * purchases(p_user, p_ts, p_value).
    */
  def funnelAttribution3(
      views: DataFrame,
      clicks: DataFrame,
      purchases: DataFrame,
      horizon1: String = "1 hour",
      horizon2: String = "1 hour",
      watermark: String = "10 minutes",
  ): DataFrame =
    views
      .withWatermark("v_ts", watermark)
      .join(
        clicks.withWatermark("c_ts", watermark),
        expr(s"v_user = c_user AND c_ts >= v_ts AND c_ts <= v_ts + interval $horizon1"),
      )
      // a stream may carry at most ONE event-time column into the next
      // stateful op: c_ts stays the watermark carrier (it bounds hop 2),
      // v_ts demotes to a plain micros value for the output
      .select(col("v_user"), unix_micros(col("v_ts")).as("v_ts_us"), col("c_ts"))
      .join(
        purchases.withWatermark("p_ts", watermark),
        expr(s"v_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval $horizon2"),
      )
}
