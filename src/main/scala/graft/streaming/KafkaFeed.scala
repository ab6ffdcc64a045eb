package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** Kafka connection + flow-control config for a changefeed topic. The
  * fields mirror the spark-sql-kafka option surface a changefeed
  * deployment actually tunes:
  *  - `startingOffsets`: "earliest" for backfill-then-follow, "latest"
  *    for tail-only, or a per-partition JSON offset map for exact
  *    resume (the option is passed through verbatim);
  *  - `maxOffsetsPerTrigger`: micro-batch admission control — caps
  *    records per trigger so a backlogged topic can't produce an
  *    unboundedly large first batch (state-store sizing depends on it);
  *  - `failOnDataLoss`: fail vs skip when offsets age out of retention
  *    mid-stream;
  *  - `extra`: passthrough for anything else (kafka.security.protocol,
  *    groupIdPrefix, ...).
  */
case class KafkaFeedConfig(
    bootstrapServers: String,
    topic: String,
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = None,
    failOnDataLoss: Boolean = true,
    extra: Map[String, String] = Map.empty,
)

/** Kafka source/sink adapter (SURVEY §2 #148): a changefeed engine's #1
  * real transport, compiled onto `format("kafka")` with the #67 wire
  * format ([[ChangeFeed.toWire]]/[[ChangeFeed.fromWire]]: value = JSON
  * Change blob with full-microsecond timestamps, key = change key bytes
  * so per-key ordering rides the Kafka partition).
  *
  * No broker (or connector jar) exists in this sandbox, so the adapter
  * is factored exactly along the testable seam: [[sourceOptions]] /
  * [[sinkOptions]] are pure option maps (spec'd key-for-key),
  * [[reader]] is the configured `DataStreamReader` with the transport
  * format swappable (the spec drives the SAME load path through a file
  * source carrying wire-schema records and gets µs-exact Changes out),
  * and [[fromKafkaWire]] is the post-transport projection shared by
  * both. `fromKafka`/`toKafka` are then one-liners over those pieces —
  * the only parts a broker deployment adds are the jar and the URL.
  */
object KafkaFeed {

  /** The exact option map `spark.readStream.format("kafka")` receives. */
  def sourceOptions(cfg: KafkaFeedConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe"               -> cfg.topic,
      "startingOffsets"         -> cfg.startingOffsets,
      "failOnDataLoss"          -> cfg.failOnDataLoss.toString,
    ) ++ cfg.maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString) ++ cfg.extra

  /** The exact option map the Kafka SINK receives (topic + servers). */
  def sinkOptions(cfg: KafkaFeedConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "topic"                   -> cfg.topic,
    ) ++ cfg.extra

  /** The configured streaming reader. `transportFormat` defaults to the
    * real connector; tests swap in a file source (which ignores the
    * Kafka-specific options) to drive the identical load path without a
    * broker.
    */
  def reader(spark: SparkSession, cfg: KafkaFeedConfig,
      transportFormat: String = "kafka"): DataStreamReader =
    spark.readStream.format(transportFormat).options(sourceOptions(cfg))

  /** Post-transport projection: Kafka's (key, value) binary contract →
    * parsed Change columns, poison records dropped (route them with
    * [[ChangeFeed.deadLetters]]). Shared verbatim by the real source
    * and the broker-less spec path.
    */
  def fromKafkaWire(raw: DataFrame): DataFrame =
    ChangeFeed.fromWire(raw.select(col("key"), col("value")))

  /** Live changefeed from a Kafka topic. */
  def fromKafka(spark: SparkSession, cfg: KafkaFeedConfig): DataFrame =
    fromKafkaWire(reader(spark, cfg).load())

  /** Publish a changefeed to a Kafka topic in the wire format. The
    * returned writer still needs `.start()`.
    *
    * ==Delivery contract (the exactly-once story, spelled out)==
    *
    *  - SOURCE side: exactly-once — the checkpoint dir carries the
    *    committed Kafka offsets; a restart re-reads from the last
    *    committed batch, never skips.
    *  - SINK side: AT-LEAST-ONCE. Spark's Kafka sink has no cross-batch
    *    transactions (a replayed micro-batch re-sends its records), and
    *    a transactional.id would only scope one producer instance — so
    *    this library does not pretend EOS at the broker.
    *    `idempotentProducer = true` passes the broker-level options
    *    (`kafka.enable.idempotence`, `kafka.acks=all`) through, which
    *    removes duplicates from producer RETRIES within a session but
    *    NOT from batch replays.
    *  - END-TO-END exactly-once is the CONSUMER's dedup contract: every
    *    wire record carries its change identity `(key, ts µs, seq)`,
    *    and folding per key in `(ts, seq)` order makes redelivery
    *    idempotent — [[CdcMaterializer]]'s stale-drop, the planner's
    *    stage-1 folds, and FeedSink/JdbcSink's batch markers all
    *    already do this. A non-graft consumer must either dedup on that
    *    identity or be a naturally idempotent upsert keyed by it.
    */
  def toKafka(changes: DataFrame, cfg: KafkaFeedConfig, checkpointDir: String,
      idempotentProducer: Boolean = false): DataStreamWriter[Row] =
    ChangeFeed
      .toWire(changes)
      .writeStream
      .format("kafka")
      .options(sinkOptions(cfg) ++ (if (idempotentProducer) idempotentProducerOptions else Map.empty))
      .option("checkpointLocation", checkpointDir)

  /** Broker-level producer idempotence pass-through (see the [[toKafka]]
    * delivery contract: dedups producer retries within a session, NOT
    * batch replays — consumer dedup stays required for exactly-once).
    */
  val idempotentProducerOptions: Map[String, String] = Map(
    "kafka.enable.idempotence" -> "true",
    "kafka.acks"               -> "all",
  )
}
