package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Kafka adapter (SURVEY §2 #148): no broker/connector jar exists in the
  * sandbox, so the specs cover the adapter along its factored seam — the
  * option maps key-for-key, the options actually landing on the
  * configured reader/writer, and the full load path driven through a
  * swapped file transport carrying wire-schema records.
  */
class KafkaFeedSpec extends SparkSpec {

  private def ts(minutes: Int): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  private def tmp(prefix: String): String = {
    val base = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private val cfg = KafkaFeedConfig(
    bootstrapServers = "broker1:9092,broker2:9092",
    topic = "graft_changes",
    startingOffsets = """{"graft_changes":{"0":42}}""",
    maxOffsetsPerTrigger = Some(10000L),
    failOnDataLoss = false,
    extra = Map("kafka.security.protocol" -> "SASL_SSL"),
  )

  /** Every Map-valued field reachable on the object (the reader/writer
    * keep their option map private; the spec asserts what LANDED, not
    * just what we built).
    */
  private def mapsOf(o: AnyRef): Seq[Map[String, String]] =
    o.getClass.getDeclaredFields.toSeq.flatMap { f =>
      f.setAccessible(true)
      f.get(o) match {
        case m: scala.collection.Map[_, _] =>
          Some(m.map { case (k, v) => k.toString.toLowerCase -> v.toString }.toMap)
        case _ => None
      }
    }

  test("#148 source/sink option maps carry the full Kafka contract") {
    val src = KafkaFeed.sourceOptions(cfg)
    assert(src("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(src("subscribe") == "graft_changes")
    assert(src("startingOffsets") == """{"graft_changes":{"0":42}}""")
    assert(src("maxOffsetsPerTrigger") == "10000")
    assert(src("failOnDataLoss") == "false")
    assert(src("kafka.security.protocol") == "SASL_SSL")
    // no trigger cap -> option absent (not "None"/"null")
    assert(!KafkaFeed.sourceOptions(cfg.copy(maxOffsetsPerTrigger = None))
      .contains("maxOffsetsPerTrigger"))
    val sink = KafkaFeed.sinkOptions(cfg)
    assert(sink("topic") == "graft_changes" && sink("kafka.bootstrap.servers").nonEmpty)
  }

  test("#148b configured reader/writer actually hold the options (reflection on the private map)") {
    val reader = KafkaFeed.reader(spark, cfg)
    val rmaps  = mapsOf(reader)
    assert(rmaps.exists(m => m.get("subscribe").contains("graft_changes")
        && m.get("maxoffsetspertrigger").contains("10000")
        && m.get("startingoffsets").exists(_.contains("42"))),
      s"reader lost the source options: $rmaps")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Change]
    val writer = KafkaFeed.toKafka(input.toDF(), cfg, tmp("kwr"))
    val wmaps = mapsOf(writer)
    assert(wmaps.exists(m => m.get("topic").contains("graft_changes")),
      s"writer lost the sink options: $wmaps")
  }

  test("#148e idempotent-producer options land on the writer; delivery contract documented") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input  = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Change]
    val writer = KafkaFeed.toKafka(input.toDF(), cfg, tmp("kwr2"), idempotentProducer = true)
    val wmaps  = mapsOf(writer)
    assert(wmaps.exists(m => m.get("kafka.enable.idempotence").contains("true")
        && m.get("kafka.acks").contains("all")
        && m.get("topic").contains("graft_changes")),
      s"writer lost the idempotent-producer options: $wmaps")
    // default stays plain at-least-once (no surprise producer configs)
    val plain = mapsOf(KafkaFeed.toKafka(input.toDF(), cfg, tmp("kwr3")))
    assert(!plain.exists(_.contains("kafka.enable.idempotence")))
  }

  test("#148c full load path with the transport swapped to files: wire records -> µs-exact Changes") {
    import spark.implicits._
    val subMs = { val t = ts(1); t.setNanos(123456000); t } // µs precision must survive
    val sent = Seq(
      Change("insert", 7L, subMs, Map("v" -> "a", "k" -> "x"), seq = 42L),
      Change("update", 7L, ts(2), Map("v" -> "b"), seq = 43L),
      Change("delete", 8L, ts(3), Map.empty, seq = 44L),
    )
    // producer side: the EXACT bytes toKafka would publish, parked as
    // parquet so a file source can replay them as the transport
    val wireDir = tmp("kwire")
    ChangeFeed.toWire(sent.toDF()).write.mode("overwrite").parquet(wireDir)
    val wireSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    val stream = KafkaFeed
      .reader(spark, cfg, transportFormat = "parquet") // file source ignores the kafka-only options
      .schema(wireSchema)
      .option("path", wireDir)
      .load()
    val q = KafkaFeed.fromKafkaWire(stream)
      .writeStream.format("memory").queryName("kafka_feed").outputMode(OutputMode.Append())
      .option("checkpointLocation", tmp("kchk")).start()
    try {
      q.processAllAvailable()
      val got = spark.table("kafka_feed").as[Change].collect().sortBy(_.seq)
      assert(got.toSeq == sent, s"swapped-transport feed mismatch: ${got.toSeq}")
    } finally q.stop()
  }

  test("#148d poison wire records drop from the feed and surface as dead letters") {
    import spark.implicits._
    val poison = Seq(
      ("k".getBytes, "not json at all".getBytes),
      ("k".getBytes, """{"op":"insert"}""".getBytes), // no key/ts
    ).toDF("key", "value")
    assert(KafkaFeed.fromKafkaWire(poison).count() == 0)
    assert(ChangeFeed.deadLetters(poison).count() == 2)
  }
}
