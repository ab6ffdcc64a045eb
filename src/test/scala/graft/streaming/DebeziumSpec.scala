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

  test("#222f Debezium over AVRO (registry wire): the same capture decodes identically; Confluent framing strips; poison dead-letters") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    val envSchemaJson =
      """{"type":"record","name":"Envelope","namespace":"pg.public.customers","fields":[
        |{"name":"before","type":["null",{"type":"record","name":"Value","fields":[
        |  {"name":"id","type":"long"},{"name":"name","type":["null","string"],"default":null},
        |  {"name":"city","type":["null","string"],"default":null}]}],"default":null},
        |{"name":"after","type":["null","Value"],"default":null},
        |{"name":"source","type":{"type":"record","name":"Source","fields":[
        |  {"name":"ts_ms","type":"long"},{"name":"lsn","type":["null","long"],"default":null}]}},
        |{"name":"op","type":"string"},
        |{"name":"ts_ms","type":["null","long"],"default":null}
        |]}""".stripMargin
    val schema = new Schema.Parser().parse(envSchemaJson)
    val valueSchema = schema.getField("before").schema().getTypes.get(1)
    def row(id: Long, name: String, city: String): GenericRecord = {
      val r = new GenericData.Record(valueSchema)
      r.put("id", id); r.put("name", name); r.put("city", city); r
    }
    def envelope(op: String, before: GenericRecord, after: GenericRecord,
        tsMs: Long, lsn: Long): Array[Byte] = {
      val src = new GenericData.Record(schema.getField("source").schema())
      src.put("ts_ms", tsMs); src.put("lsn", lsn)
      val e = new GenericData.Record(schema)
      e.put("before", before); e.put("after", after); e.put("source", src)
      e.put("op", op); e.put("ts_ms", tsMs + 250L)
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(e, enc)
      enc.flush()
      out.toByteArray
    }
    // the #222a capture, re-authored over the Avro envelope
    val wireBytes: Seq[Array[Byte]] = Seq(
      envelope("c", null, row(1L, "ann", "ber"), 1700000000000L, 101L),
      envelope("r", null, row(3L, "cat", "par"), 1700000000000L, 90L),
      envelope("u", row(1L, "ann", "ber"), row(1L, "ann2", "par"), 1700000060000L, 105L),
      envelope("c", null, row(2L, "bob", "ber"), 1700000030000L, 103L),
      envelope("d", row(2L, "bob", "ber"), null, 1700000120000L, 110L),
      envelope("u", row(1L, "x", "x"), row(1L, "STALE", "xxx"), 1700000010000L, 102L))
    val wire = spark.createDataFrame(
      spark.sparkContext.parallelize(wireBytes.map(b => org.apache.spark.sql.Row("k".getBytes, b)) :+
        org.apache.spark.sql.Row("k".getBytes, null) :+                    // tombstone: dropped
        org.apache.spark.sql.Row("k".getBytes, "garbage".getBytes), 2),    // poison: dead-letters
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.BinaryType))))
    val got = AvroWire.fromDebezium(wire, envSchemaJson, "id").collect().toSeq
      .sortBy(c => (CdcMaterializer.micros(c.ts), c.seq))
    val want = graftEquivalent.sortBy(c => (CdcMaterializer.micros(c.ts), c.seq))
    assert(got == want, s"avro capture:\n  ${got.mkString("\n  ")}\nwant:\n  ${want.mkString("\n  ")}")
    val dead = AvroWire.debeziumDeadLetters(wire, envSchemaJson, "id").count()
    assert(dead == 1L, s"exactly the poison record dead-letters (never the tombstone): $dead")

    // Confluent framing: magic 0x0 + 4-byte schema id before the body
    val framed = wireBytes.map(b => Array[Byte](0, 0, 0, 0, 7) ++ b)
    val wireF = spark.createDataFrame(
      spark.sparkContext.parallelize(framed.map(b => org.apache.spark.sql.Row("k".getBytes, b)), 2),
      wire.schema)
    val gotF = AvroWire.fromDebezium(wireF, envSchemaJson, "id", confluentHeader = true)
      .collect().toSeq.sortBy(c => (CdcMaterializer.micros(c.ts), c.seq))
    assert(gotF == want, "Confluent-framed bodies must decode identically")
    // and unframed bytes under confluentHeader=true are poison, not misreads
    assert(AvroWire.fromDebezium(wire, envSchemaJson, "id", confluentHeader = true).count()
      < wireBytes.length, "raw bodies must not silently parse as framed")
  }

  test("#222g string primary keys hash-key deterministically, identically on the JSON and Avro adapters") {
    import org.apache.spark.sql.functions.{col, xxhash64, lit}
    val json = """{"payload":{"op":"c","after":{"uid":"u-42","v":"1"},""" +
      """"source":{"ts_ms":1700000000000,"lsn":9}}}"""
    implicit val enc = Encoders.product[Change]
    val c1 = ChangeFeed.fromDebezium(Seq(("k", json)).toDF("key", "value"), "uid").as[Change].head()
    val expectHash = spark.range(1).select(xxhash64(lit("u-42"))).head().getLong(0)
    assert(c1.key == expectHash, s"json adapter key ${c1.key} != xxhash64 $expectHash")
    assert(c1.payload("uid") == "u-42", "the natural key survives in the payload")
    // same row's delete (before-image) folds onto the same key
    val del = """{"payload":{"op":"d","before":{"uid":"u-42","v":"1"},""" +
      """"source":{"ts_ms":1700000060000,"lsn":10}}}"""
    val c2 = ChangeFeed.fromDebezium(Seq(("k", del)).toDF("key", "value"), "uid").as[Change].head()
    assert(c2.key == c1.key && c2.op == "delete")
    // the Avro adapter's executor-side hash is the same function
    val avroSide = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("u-42"),
      org.apache.spark.sql.types.StringType, 42L)
    assert(avroSide == expectHash, "JSON and Avro adapters must hash string PKs identically")
  }

  test("#222h CAPSTONE: snapshot bootstrap UNION live Debezium feed drives one planner view to the batch answer") {
    // the full production shape in one query: an existing table's
    // snapshot (compacted changefeed prefix via writeBootstrap) unioned
    // with the live CDC topic (the Debezium JSON adapter), one
    // materialize() over the combined feed — convergence over
    // O(current keys) + the tail, stale tail changes dropped against
    // bootstrapped positions
    implicit val sqlCtx = spark.sqlContext
    val bootDir = java.nio.file.Files.createTempDirectory(
      new java.io.File("target/streaming-tmp").toPath, "dbzboot").toString
    // snapshot: customers 1 (ber, pos ts=1700000050000/lsn=104) and 3 (par, 1700000000000/90)
    import spark.implicits._
    val snap = Seq(
      (1L, new java.sql.Timestamp(1700000050000L), 104L, "ann", "ber"),
      (3L, new java.sql.Timestamp(1700000000000L), 90L, "cat", "par"))
      .toDF("id", "ts", "seq", "name", "city")
    ChangeFeed.writeBootstrap(snap, "id", "ts", Some("seq"), bootDir)
    val bootFeed = ChangeFeed.readJsonDir(spark, bootDir).as[Change]
    val topic = MemoryStream[(String, String)]
    val liveFeed = ChangeFeed.fromDebezium(topic.toDF().toDF("key", "value"), "id").as[Change]
    val pv = IncrementalPlanner.materialize(spark,
      "SELECT city, count(*) AS n FROM customers GROUP BY city",
      Map("customers" -> bootFeed.union(liveFeed)))
    val q = pv.df.writeStream.format("memory").queryName("dbz_capstone")
      .outputMode(pv.outputMode)
      .option("checkpointLocation", tmp("dbzcapck")).start()
    try {
      // live tail: customer 1 moves ber→par (newer than snapshot), a
      // STALE pre-snapshot change for 1 (lsn 102 < 104: must drop), and
      // customer 2 arrives new
      topic.addData(
        ("k", pgEnvelope("u", """{"id":1,"name":"ann","city":"ber"}""",
          """{"id":1,"name":"ann","city":"par"}""", 1700000060000L, 105L)),
        ("k", pgEnvelope("u", """{"id":1,"name":"x","city":"x"}""",
          """{"id":1,"name":"STALE","city":"xxx"}""", 1700000010000L, 102L)),
        ("k", pgEnvelope("c", "null", """{"id":2,"name":"bob","city":"ber"}""", 1700000120000L, 110L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dbz_capstone").collect().toSeq
      .groupBy(_.getAs[String]("city")).view.mapValues(_.last)
      .collect { case (city, r) if r.getAs[Long]("_live_rows") > 0L => city -> r.getAs[Long]("n") }
      .toMap
    // batch truth: {1: par (moved), 2: ber (new), 3: par (snapshot-only)}
    assert(got == Map("par" -> 2L, "ber" -> 1L), s"capstone view: $got")
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
