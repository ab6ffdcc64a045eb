package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming UNIFORM SAMPLE view (SURVEY.md §2.3 #330) — a live k-row
  * uniform sample per stratum, maintained over an unbounded feed with NO
  * randomness: the reservoir is the k rows whose md5(id) is smallest
  * (bottom-k of a fixed uniform hash = a uniform sample of everything
  * seen, the q42/q48 "never rand()" discipline made streaming).
  *
  * Determinism buys three properties a classic Vitter reservoir cannot
  * give a changefeed deployment:
  *   - batching invariance: the store after any micro-batch split equals
  *     the batch answer over all rows seen (bottom-k is associative);
  *   - idempotent replay: a redelivered row ranks identically, so
  *     at-least-once delivery cannot bias the sample;
  *   - cross-engine agreement: any engine with md5 reproduces the sample.
  *
  * Maintenance is the TopKView store discipline: only TOUCHED strata are
  * read back (semi-join), merged, re-ranked, and rewritten via dynamic
  * partition overwrite — state is k rows per stratum, an untouched
  * stratum's partition is never opened. Eviction is lossless
  * unconditionally here (stronger than top-k's monotone-total caveat):
  * a row's hash never changes, so a row outside the bottom-k can never
  * re-enter. Deletes are out of scope by design — the view samples the
  * feed's INSERT history (sampling live state under retraction needs the
  * ranked-view machinery instead).
  */
object SampleView {

  /** Fold one micro-batch into the per-stratum reservoir store. */
  def updateBatch(batch: DataFrame, storeDir: String, k: Int): Unit = {
    val spark = batch.sparkSession
    // Dedup WITHIN the batch first (r13 advice): a row redelivered inside one
    // micro-batch must not occupy two reservoir slots, and the survivor must
    // be deterministic even if payloads differ — max-by(payload) per (stratum,id).
    val cand = batch
      .select(col("stratum"), col("id"), col("payload"))
      .groupBy("stratum", "id").agg(max("payload").as("payload"))
      .withColumn("h", md5(col("id").cast("string")))
    val existing =
      try
        spark.read.parquet(storeDir)
          .select("stratum", "id", "payload", "h")
          .join(cand.select("stratum").distinct(), Seq("stratum"), "left_semi")
      catch { case _: AnalysisException => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], cand.schema) }
    val w = Window.partitionBy("stratum").orderBy(col("h"), col("id"))
    existing
      .join(cand, Seq("stratum", "id"), "left_anti") // replays replace themselves
      .unionByName(cand)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .localCheckpoint(true) // store is both source and sink of this job
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("stratum")
      .parquet(storeDir)
  }

  /** #330 wired end-to-end: feed (stratum, id, payload) → reservoir store. */
  def sample(feed: DataFrame, storeDir: String, checkpointDir: String, k: Int = 64): DataStreamWriter[Row] =
    feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => updateBatch(batch, storeDir, k) }
}
