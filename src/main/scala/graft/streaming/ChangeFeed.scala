package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A changefeed record: one row-level change event.
  *
  * `op` is one of insert/update/delete (upsert semantics: insert and update
  * are both last-writer-wins puts), `key` the primary key, `ts` the commit
  * timestamp (event time), `payload` the after-image columns.
  */
case class Change(
    op: String,
    key: Long,
    ts: java.sql.Timestamp,
    payload: Map[String, String],
)

/** Changefeed sources (SURVEY.md §2.3 #31).
  *
  * Spark-native CDC ingestion: a streaming file/dir source with the Change
  * schema. On a real deployment the same schema rides a Kafka source
  * (`spark.readStream.format("kafka")` + from_json) — the downstream
  * operators only see the Change columns, so the transport is swappable.
  */
object ChangeFeed {

  val schema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("key", LongType),
    StructField("ts", TimestampType),
    StructField("payload", MapType(StringType, StringType)),
  ))

  /** Stream change records from newline-JSON files appearing under `dir`. */
  def readJsonDir(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).json(dir)

  /** Interpret the `events` snapshot table as a replayable changefeed
    * (signup -> insert, purchase/view/click -> update, error -> delete),
    * keyed by user. Used to exercise the streaming operators against the
    * same data the batch analogues (q21/q22) are oracle-checked on.
    */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "error", "delete")
        .otherwise("update")
        .as("op"),
      col("user_id").as("key"),
      col("ts"),
      map(
        lit("value"), col("value").cast("string"),
        lit("event_type"), col("event_type"),
      ).as("payload"),
    )
}
