package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Changefeed sink (SURVEY.md §2.3 #37): every micro-batch of materialized
  * KeyState rows is appended to `feedDir` as changefeed records — the
  * materialized view re-emits its own deltas, which is what makes derived
  * views composable in a changefeed engine.
  *
  * foreachBatch gives exactly-once per micro-batch when paired with the
  * checkpoint: the batchId is recorded in the output so a replayed batch
  * overwrites deterministically (idempotent by `(batch_id, key)`).
  */
object FeedSink {

  def writeChangefeed(states: DataFrame, feedDir: String, checkpointDir: String): DataStreamWriter[Row] =
    states.writeStream
      .outputMode(CdcMaterializer.outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .select(
            lit(batchId).as("batch_id"),
            when(col("deleted"), "delete").otherwise("upsert").as("op"),
            col("key"),
            col("tsUs").as("ts_us"),
            col("payload"),
          )
          .write
          .mode(SaveMode.Append)
          .parquet(feedDir)
      }
}
