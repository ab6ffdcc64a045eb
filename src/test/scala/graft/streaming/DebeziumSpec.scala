package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2.3 #222 — Debezium envelope adapter: a canned Postgres/
  * MySQL CDC capture (the public envelope schema, hand-written fixture)
  * consumed unchanged through [[ChangeFeed.fromDebezium]] materializes
  * to the same state as the equivalent graft feed; poison envelopes
  * dead-letter; compaction tombstones drop.
  */
class DebeziumSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val root = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(root)
    Files.createTempDirectory(root, prefix).toString
  }

  /** One Postgres-flavor envelope (schema wrapper optional). */
  private def pgEnvelope(op: String, before: String, after: String, tsMs: Long, lsn: Long,
      wrapped: Boolean = true): String = {
    val env = s"""{"before":$before,"after":$after,""" +
      s""""source":{"version":"2.5.0","connector":"postgresql","name":"pg","ts_ms":$tsMs,""" +
      s""""db":"app","schema":"public","table":"customers","lsn":$lsn,"txId":7},""" +
      s""""op":"$op","ts_ms":${tsMs + 250}}"""
    if (wrapped) s"""{"schema":{"type":"struct","name":"pg.public.customers.Envelope"},"payload":$env}"""
    else env
  }

  // the capture: create, snapshot read, update, create, delete, and a
  // STALE update arriving late (older commit position than applied state)
  private val capture: Seq[(String, String)] = Seq(
    ("""{"payload":{"id":1}}""",
      pgEnvelope("c", "null", """{"id":1,"name":"ann","city":"ber"}""", 1700000000000L, 101L)),
    ("""{"payload":{"id":3}}""",
      pgEnvelope("r", "null", """{"id":3,"name":"cat","city":"par"}""", 1700000000000L, 90L)),
    ("""{"payload":{"id":1}}""",
      pgEnvelope("u", """{"id":1,"name":"ann","city":"ber"}""",
        """{"id":1,"name":"ann2","city":"par"}""", 1700000060000L, 105L, wrapped = false)),
    ("""{"payload":{"id":2}}""",
      pgEnvelope("c", "null", """{"id":2,"name":"bob","city":"ber"}""", 1700000030000L, 103L)),
    ("""{"payload":{"id":2}}""",
      pgEnvelope("d", """{"id":2,"name":"bob","city":"ber"}""", "null", 1700000120000L, 110L)),
    ("""{"payload":{"id":1}}""",
      pgEnvelope("u", """{"id":1,"name":"x","city":"x"}""",
        """{"id":1,"name":"STALE","city":"xxx"}""", 1700000010000L, 102L)),
  )

  /** The same history as a native graft feed. */
  private val graftEquivalent: Seq[Change] = Seq(
    Change("upsert", 1L, new java.sql.Timestamp(1700000000000L), Map("id" -> "1", "name" -> "ann", "city" -> "ber"), 101L),
    Change("upsert", 3L, new java.sql.Timestamp(1700000000000L), Map("id" -> "3", "name" -> "cat", "city" -> "par"), 90L),
    Change("upsert", 1L, new java.sql.Timestamp(1700000060000L), Map("id" -> "1", "name" -> "ann2", "city" -> "par"), 105L),
    Change("upsert", 2L, new java.sql.Timestamp(1700000030000L), Map("id" -> "2", "name" -> "bob", "city" -> "ber"), 103L),
    Change("delete", 2L, new java.sql.Timestamp(1700000120000L), Map.empty, 110L),
    Change("upsert", 1L, new java.sql.Timestamp(1700000010000L), Map("id" -> "1", "name" -> "STALE", "city" -> "xxx"), 102L),
  )

  test("#222a a canned Debezium capture parses to the exact graft changefeed (wrapped AND bare envelopes)") {
    val wire = capture.toDF("key", "value")
    implicit val enc = Encoders.product[Change]
    val got = ChangeFeed.fromDebezium(wire, "id").as[Change].collect().toSeq
    assert(got == graftEquivalent, s"parsed:\n  ${got.mkString("\n  ")}")
  }

  test("#222b Debezium feed materializes to the same state as the equivalent graft feed; stale LSN drops") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val changes = ChangeFeed.fromDebezium(input.toDF().toDF("key", "value"), "id").as[Change]
    val q = CdcMaterializer.materialize(changes).toDF()
      .writeStream.format("memory").queryName("dbz_state")
      .outputMode(CdcMaterializer.outputMode)
      .option("checkpointLocation", tmp("dbzck")).start()
    try {
      capture.foreach { kv => input.addData(kv); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("dbz_state").collect().toSeq
      .groupBy(_.getAs[Long]("key")).view.mapValues(_.last)
      .collect { case (k, r) if !r.getAs[Boolean]("deleted") => k -> r.getAs[Map[String, String]]("payload") }
      .toMap
    val want = graftEquivalent.groupBy(_.key)
      .view.mapValues { cs =>
        val last = cs.sortBy(c => (CdcMaterializer.micros(c.ts), c.seq)).last
        if (last.op == "delete") None else Some(last.payload)
      }
      .collect { case (k, Some(p)) => k -> p }.toMap
    assert(got == want, s"debezium state $got != graft state $want")
    // the stale update (ts 1700000010000, lsn 102) lost to (1700000060000, 105)
    assert(got(1L)("name") == "ann2")
  }

  test("#222c MySQL source.pos rides seq; envelope ts_ms is the fallback commit time") {
    val mysql = """{"before":null,"after":{"id":9,"v":"m"},""" +
      """"source":{"connector":"mysql","name":"my","file":"binlog.000002","pos":4711},""" +
      """"op":"c","ts_ms":1700000200000}"""
    implicit val enc = Encoders.product[Change]
    val c = ChangeFeed.fromDebezium(Seq(("k", mysql)).toDF("key", "value"), "id").as[Change].head()
    assert(c == Change("upsert", 9L, new java.sql.Timestamp(1700000200000L), Map("id" -> "9", "v" -> "m"), 4711L), s"mysql: $c")
  }

  test("#222d poison envelopes dead-letter; compaction tombstones drop from both paths") {
    val rows: Seq[(String, String)] = Seq(
      ("k1", "not json at all"),
      ("k2", """{"payload":{"after":{"id":5},"source":{"ts_ms":1},"ts_ms":1}}"""), // no op
      ("k3", pgEnvelope("c", "null", """{"name":"keyless"}""", 1700000000000L, 1L)), // image lacks the pk
      ("k4", """{"payload":{"op":"c","after":{"id":6,"v":"1"},"source":{"lsn":2}}}"""), // no commit time
      ("k5", null), // tombstone
      ("k6", pgEnvelope("c", "null", """{"id":7,"v":"ok"}""", 1700000000000L, 3L)), // the one good record
    )
    val wire = rows.toDF("key", "value")
    val good = ChangeFeed.fromDebezium(wire, "id").collect()
    assert(good.length == 1 && good.head.getAs[Long]("key") == 7L, s"good: ${good.toSeq}")
    val dead = ChangeFeed.debeziumDeadLetters(wire, "id").as[String].collect().toSet
    assert(dead.size == 4 && dead.exists(_.contains("keyless")) && !dead.contains(null),
      s"dead letters must be the 4 poison envelopes, never the tombstone: $dead")
  }

  test("#222e end-to-end: a planner view maintains over a Debezium topic unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    implicit val enc = Encoders.product[Change]
    val feed = ChangeFeed.fromDebezium(input.toDF().toDF("key", "value"), "id").as[Change]
    val pv = IncrementalPlanner.materialize(spark,
      "SELECT city, count(*) AS n FROM customers GROUP BY city", Map("customers" -> feed))
    val q = pv.df.writeStream.format("memory").queryName("dbz_view")
      .outputMode(pv.outputMode).option("checkpointLocation", tmp("dbzpvck")).start()
    try {
      input.addData(capture: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dbz_view").collect().toSeq
      .groupBy(_.getAs[String]("city")).view.mapValues(_.last)
      .collect { case (city, r) if r.getAs[Long]("_live_rows") > 0L => city -> r.getAs[Long]("n") }
      .toMap
    assert(got == Map("par" -> 2L), s"planner view over debezium: $got")
  }
}
