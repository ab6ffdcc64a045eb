package graft.streaming

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Binary Avro wire format for the changefeed (SURVEY.md §2.3 #172) —
  * the production Kafka-changefeed codec class (Debezium-style): the
  * Change rides as a schema-less Avro binary blob keyed by the change
  * key, with the WRITER schema distributed out of band (a schema
  * registry in deployment; a parameter here) and resolved against the
  * READER schema on decode. This is the second codec behind the same
  * transport contract as [[ChangeFeed.toWire]]/[[ChangeFeed.fromWire]]
  * (JSON): downstream operators only ever see Change columns, so the
  * wire format is swappable per topic.
  *
  * Schema resolution follows Avro's standard rules (the #134 JSON
  * evolution cases, now in binary):
  *  - a field the reader declares but the writer lacks fills from the
  *    reader's DEFAULT (e.g. feeds predating `seq` decode as seq=0);
  *  - a field the writer wrote but the reader doesn't know is IGNORED
  *    (new producers don't break old consumers);
  *  - undecodable blobs (garbage, truncation, trailing bytes) are
  *    dropped by [[fromWire]] and surfaced by [[deadLetters]] — one
  *    poison record must not kill the query (the #31c contract).
  *
  * Plumbing: Avro has no Catalyst expression, so encode/decode run in
  * `mapPartitions` with per-partition codec instances (the Multimodal
  * pattern) — embarrassingly parallel, no shuffle, schemas shipped as
  * JSON strings (org.apache.avro.Schema is not serializable). `ts`
  * crosses the wire as epoch MICROS (long) so sub-millisecond ordering
  * survives, matching the JSON codec's full-precision timestampFormat.
  */
object AvroWire {

  /** The reader (current) schema of a Change on the wire. */
  val changeSchemaJson: String =
    """{"type":"record","name":"Change","namespace":"graft.wire","fields":[
      |{"name":"op","type":"string"},
      |{"name":"key","type":"long"},
      |{"name":"ts_us","type":"long"},
      |{"name":"payload","type":{"type":"map","values":"string"}},
      |{"name":"seq","type":"long","default":0}
      |]}""".stripMargin

  /** Encode a Change stream to (key: binary, value: binary) wire rows
    * using `writerSchemaJson` (defaults to the current schema). Fields
    * the writer schema doesn't declare are simply not written — which is
    * exactly how an OLD producer behaves, so specs can author
    * time-machine feeds with the real codec.
    */
  def toWire(changes: Dataset[Change], writerSchemaJson: String = changeSchemaJson): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.BINARY, Encoders.BINARY)
    changes.mapPartitions { it =>
      val schema  = new Schema.Parser().parse(writerSchemaJson)
      val writer  = new GenericDatumWriter[GenericRecord](schema)
      val factory = EncoderFactory.get()
      val fields  = schema.getFields.asScala.map(_.name).toSet
      it.map { c =>
        val rec = new GenericData.Record(schema)
        def put(n: String, v: Any): Unit = if (fields(n)) rec.put(n, v)
        put("op", c.op)
        put("key", c.key)
        put("ts_us", CdcMaterializer.micros(c.ts))
        put("payload", c.payload.asJava)
        put("seq", c.seq)
        val out = new ByteArrayOutputStream()
        val e   = factory.binaryEncoder(out, null)
        writer.write(rec, e)
        e.flush()
        (c.key.toString.getBytes("UTF-8"), out.toByteArray)
      }
    }.toDF("key", "value")
  }

  private def decodeOne(
      reader: GenericDatumReader[GenericRecord],
      bytes: Array[Byte]): Option[Change] =
    Try {
      val d   = DecoderFactory.get().binaryDecoder(bytes, null)
      val rec = reader.read(null, d)
      require(d.isEnd, "trailing bytes after Avro record")
      val payload = rec.get("payload").asInstanceOf[java.util.Map[Any, Any]]
        .asScala.map { case (k, v) => k.toString -> v.toString }.toMap
      Change(
        rec.get("op").toString,
        rec.get("key").asInstanceOf[Long],
        tsOfMicros(rec.get("ts_us").asInstanceOf[Long]),
        payload,
        rec.get("seq").asInstanceOf[Long])
    }.toOption

  private def tsOfMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Decode wire rows written with `writerSchemaJson` (the out-of-band
    * schema registry lookup), resolving to the current Change schema.
    * Poison rows are DROPPED — route them with [[deadLetters]].
    */
  def fromWire(wire: DataFrame, writerSchemaJson: String = changeSchemaJson): Dataset[Change] = {
    implicit val changeEnc = Encoders.product[Change]
    wire.select(col("value")).as(Encoders.BINARY).mapPartitions { it =>
      val writer = new Schema.Parser().parse(writerSchemaJson)
      val rdr    = new Schema.Parser().parse(changeSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](writer, rdr)
      it.flatMap(bytes => decodeOne(reader, bytes))
    }
  }

  /** The complement of [[fromWire]]: raw wire values that do not decode
    * as a Change under the writer schema, for DLQ routing/alerting.
    */
  def deadLetters(wire: DataFrame, writerSchemaJson: String = changeSchemaJson): DataFrame = {
    implicit val enc = Encoders.BINARY
    wire.select(col("value")).as(Encoders.BINARY).mapPartitions { it =>
      val writer = new Schema.Parser().parse(writerSchemaJson)
      val rdr    = new Schema.Parser().parse(changeSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](writer, rdr)
      it.filter(bytes => decodeOne(reader, bytes).isEmpty)
    }.toDF("raw")
  }

  // ------------------------------------------------------------------
  // Debezium envelope over Avro (#222's binary flavor): the envelope
  // record (before/after/source/op/ts_ms) rides the topic as Avro with
  // its writer schema distributed out of band — the production
  // Debezium + registry deployment. `confluentHeader` strips the
  // Confluent wire framing (magic byte 0x0 + 4-byte schema id) the
  // registry serializer prepends; the id itself is not interpreted
  // (the schema is the out-of-band parameter, as everywhere in #172).
  // ------------------------------------------------------------------

  private def dbzDecodeOne(reader: GenericDatumReader[GenericRecord], keyField: String,
      confluentHeader: Boolean)(bytes: Array[Byte]): Option[Change] =
    Try {
      val body =
        if (!confluentHeader) bytes
        else {
          require(bytes.length > 5 && bytes(0) == 0, "missing Confluent magic/framing")
          java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
        }
      val d   = DecoderFactory.get().binaryDecoder(body, null)
      val rec = reader.read(null, d)
      val op  = rec.get("op").toString
      require(Set("c", "u", "d", "r")(op), s"unknown Debezium op '$op'")
      def recToMap(r: Any): Map[String, String] = r match {
        case g: GenericRecord =>
          g.getSchema.getFields.asScala.flatMap(f =>
            Option(g.get(f.name)).map(v => f.name -> v.toString)).toMap
        case _ => Map.empty
      }
      val image  = recToMap(if (op == "d") rec.get("before") else rec.get("after"))
      val rawKey = image.getOrElse(keyField, sys.error(s"image lacks key field $keyField"))
      // string PKs hash-key exactly like ChangeFeed.fromDebezium's
      // xxhash64 column (same seed-42 XXH64 over the UTF-8 bytes, same
      // ≤18-digit numeric rule so both adapters key identically)
      val key =
        if (rawKey.matches("^-?\\d{1,18}$")) rawKey.toLong
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(rawKey),
          org.apache.spark.sql.types.StringType, 42L)
      val source = rec.get("source") match { case g: GenericRecord => Some(g); case _ => None }
      def srcLong(n: String): Option[Long] = source.flatMap(s =>
        Try(Option(s.get(n))).toOption.flatten.flatMap(v => v.toString.toLongOption))
      val tsMs = srcLong("ts_ms")
        .orElse(Try(Option(rec.get("ts_ms"))).toOption.flatten.flatMap(_.toString.toLongOption))
        .getOrElse(sys.error("no commit time in envelope"))
      val seq = srcLong("lsn").orElse(srcLong("pos")).getOrElse(0L)
      Change(
        if (op == "d") "delete" else "upsert",
        key,
        new java.sql.Timestamp(tsMs),
        if (op == "d") Map.empty else recToMap(rec.get("after")),
        seq)
    }.toOption

  /** Parse a Debezium-Avro CDC topic into [[Change]]s: op c/u/r upsert
    * the after-image, d deletes keyed by the before-image; commit
    * position is `source.ts_ms` (envelope `ts_ms` fallback) +
    * Postgres `source.lsn` / MySQL `source.pos`. NULL values
    * (compaction tombstones) and undecodable/unmappable envelopes are
    * dropped — the latter surface via [[debeziumDeadLetters]], exactly
    * the [[ChangeFeed.fromDebezium]] JSON contract in binary.
    */
  def fromDebezium(wire: DataFrame, envelopeWriterSchemaJson: String, keyField: String,
      confluentHeader: Boolean = false): Dataset[Change] = {
    implicit val changeEnc = Encoders.product[Change]
    wire.filter(col("value").isNotNull)
      .select(col("value")).as(Encoders.BINARY).mapPartitions { it =>
        val schema = new Schema.Parser().parse(envelopeWriterSchemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        val f      = dbzDecodeOne(reader, keyField, confluentHeader) _
        it.flatMap(f(_))
      }
  }

  /** Non-tombstone records whose envelope did not yield a keyed,
    * positioned change under the writer schema.
    */
  def debeziumDeadLetters(wire: DataFrame, envelopeWriterSchemaJson: String, keyField: String,
      confluentHeader: Boolean = false): DataFrame = {
    implicit val enc = Encoders.BINARY
    wire.filter(col("value").isNotNull)
      .select(col("value")).as(Encoders.BINARY).mapPartitions { it =>
        val schema = new Schema.Parser().parse(envelopeWriterSchemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        val f      = dbzDecodeOne(reader, keyField, confluentHeader) _
        it.filter(bytes => f(bytes).isEmpty)
      }.toDF("raw")
  }
}
