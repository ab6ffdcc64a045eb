package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Offline state-store introspection — the operability surface a
  * changefeed engine owes its operators: answer "what does view X
  * currently hold for key K, and what did it hold N batches ago?"
  * WITHOUT touching the running query, by reading the query's
  * checkpoint through Spark's `statestore` / `state-metadata` batch
  * sources (SPARK-45511, Spark 4 state reader API).
  *
  * Scale posture: the reader is a plain batch scan over the state
  * files (one task per state partition), so inspection parallelism
  * equals the query's shuffle-partition count and never touches the
  * live query's stores — safe to run against a production checkpoint.
  *
  * The time-travel form (`batchId`) reads any retained snapshot: state
  * diffing across batches ("which keys changed between batch 40 and
  * 41?") is two reads and an anti-join, all offline.
  */
object StateInspect {

  /** Every stateful operator in the checkpoint: operatorId, name, and
    * the min/max batch range the state files cover.
    */
  def operators(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.format("state-metadata").load(checkpointDir)

  /** One operator's store content — by default the latest committed
    * batch; pass `batchId >= 0` to time-travel to an earlier snapshot.
    * Returns the reader's (key, value, partition_id) rows with the
    * query's own key/value schemas nested.
    */
  def store(spark: SparkSession, checkpointDir: String, operatorId: Long = 0L,
      storeName: String = "default", batchId: Long = -1L): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId)
      .option("storeName", storeName)
    (if (batchId >= 0) r.option("batchId", batchId) else r).load(checkpointDir)
  }

  /** Keys whose state differs between two batches of one operator —
    * the "what changed" diff an on-call engineer actually asks for.
    * NULL on one side means the key was absent at that batch.
    */
  def diff(spark: SparkSession, checkpointDir: String, fromBatch: Long, toBatch: Long,
      operatorId: Long = 0L, storeName: String = "default"): DataFrame = {
    val a = store(spark, checkpointDir, operatorId, storeName, fromBatch)
      .select(col("key").as("k"), col("value").as("before"))
    val b = store(spark, checkpointDir, operatorId, storeName, toBatch)
      .select(col("key").as("k"), col("value").as("after"))
    a.join(b, Seq("k"), "full_outer")
      .filter(!(col("before") <=> col("after")))
      .select(col("k").as("key"), col("before"), col("after"))
  }
}
