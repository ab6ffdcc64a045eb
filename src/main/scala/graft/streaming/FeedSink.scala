package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Changefeed sink (SURVEY.md §2.3 #37): every micro-batch of materialized
  * KeyState rows is written to `feedDir` as changefeed records — the
  * materialized view re-emits its own deltas, which is what makes derived
  * views composable in a changefeed engine.
  */
object FeedSink {

  /** Idempotent per-batch write: the batch lands in its own
    * `batch_id=<id>` partition via dynamic partition overwrite, so a
    * micro-batch replayed after a crash (data written but the checkpoint
    * offset not yet committed) OVERWRITES its own partition instead of
    * appending a second copy of every row. foreachBatch + checkpoint +
    * this overwrite is the standard Spark exactly-once file-sink recipe.
    */
  def writeBatch(states: DataFrame, batchId: Long, feedDir: String): Unit =
    states
      .select(
        lit(batchId).as("batch_id"),
        when(col("deleted"), "delete").otherwise("upsert").as("op"),
        col("key"),
        col("tsUs").as("ts_us"),
        col("seq"),
        col("payload"),
      )
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(feedDir)

  def writeChangefeed(states: DataFrame, feedDir: String, checkpointDir: String): DataStreamWriter[Row] =
    states.writeStream
      .outputMode(CdcMaterializer.outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) => writeBatch(batch, batchId, feedDir) }
}
