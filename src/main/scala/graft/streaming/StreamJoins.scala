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
}
