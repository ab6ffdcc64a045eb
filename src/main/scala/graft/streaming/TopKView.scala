package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incrementally maintained per-window top-k (SURVEY.md §2.3 #115) and
  * streaming sketch views (#116) — the leaderboard/monitoring shapes a
  * changefeed engine serves continuously.
  */
object TopKView {

  /** Stage 1 of #115: watermarked tumbling-window per-user totals in
    * Update mode — each micro-batch re-emits the FULL new total for every
    * touched (window, user), which is what makes bounded candidate
    * maintenance in [[updateBatch]] lossless.
    */
  def windowedTotals(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(sum("value").as("total"))
      .select(col("window.start").as("window_start"), col("user_id"), col("total"))

  /** Stage 2 of #115: fold one micro-batch of re-emitted totals into the
    * per-window top-k store.
    *
    * Only TOUCHED windows are read back (semi-join on the batch's
    * windows), re-ranked against the incoming totals (batch rows replace
    * stored rows for the same (window, user) — they carry the full new
    * total), and rewritten via dynamic partition overwrite. State per
    * window is k rows; an untouched window's partition is never opened.
    *
    * Eviction is lossless when per-key totals are monotone nondecreasing
    * (values >= 0): a key evicted below the top-k threshold can only
    * re-enter by growing, and any growth re-emits its full total through
    * stage 1. With signed values, k must be widened into a candidate
    * slack or the store kept unbounded — same caveat as every bounded
    * top-k maintenance scheme.
    *
    * Replays are idempotent: replace-then-rank is a deterministic
    * function of (store, batch), and the overwrite replaces the touched
    * partitions in place.
    */
  def updateBatch(batch: DataFrame, storeDir: String, k: Int): Unit = {
    val spark   = batch.sparkSession
    val touched = batch.select(col("window_start"), col("user_id"), col("total"))
    val existing =
      try
        spark.read.parquet(storeDir)
          .select(col("window_start"), col("user_id"), col("total"))
          .join(touched.select("window_start").distinct(), Seq("window_start"), "left_semi")
      catch { case _: AnalysisException => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], touched.schema) }
    val w = Window.partitionBy("window_start").orderBy(col("total").desc, col("user_id"))
    existing
      .join(touched, Seq("window_start", "user_id"), "left_anti")
      .unionByName(touched)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      // break the read-path dependency: the store is both source and sink
      // of this batch job, and Spark (rightly) refuses a self-overwrite
      .localCheckpoint(true)
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("window_start")
      .parquet(storeDir)
  }

  /** #115 wired end-to-end: totals stream -> per-window top-k store. */
  def topK(events: DataFrame, storeDir: String, checkpointDir: String, k: Int = 3): DataStreamWriter[Row] =
    windowedTotals(events).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => updateBatch(batch, storeDir, k) }

  /** #116: streaming sketch view — per-window HLL sketches of distinct
    * users maintained by the streaming aggregation itself (Datasketches
    * aggregate buffers live in the state store and merge across
    * micro-batches). The emitted row carries BOTH the estimate and the
    * sketch bytes, so any consumer can roll windows up further with
    * `hll_union_agg` — the [[graft.operators.Sketches]] algebra, live.
    */
  def windowedDistinctSketch(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll_sketch_agg(col("user_id")).as("user_hll"))
      .select(
        col("window.start").as("window_start"),
        hll_sketch_estimate(col("user_hll")).as("approx_users"),
        col("user_hll"),
      )

  /** Rollup over the #116 output: union the per-window sketches. */
  def unionSketches(windows: DataFrame): DataFrame =
    windows.agg(hll_sketch_estimate(hll_union_agg(col("user_hll"))).as("approx_total_users"))
}
