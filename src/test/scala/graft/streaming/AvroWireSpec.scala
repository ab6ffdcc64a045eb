package graft.streaming

import java.io.ByteArrayOutputStream
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** SURVEY.md §2.3 #172 — binary Avro wire format with writer/reader
  * schema resolution (the #134 evolution contract in binary) and the
  * #31c poison-record guarantee.
  */
class AvroWireSpec extends SparkSpec {

  private def ts(ms: Long, nanos: Int = 0): Timestamp = {
    val t = new Timestamp(1700000000000L + ms)
    if (nanos != 0) t.setNanos(nanos)
    t
  }

  private val changes = Seq(
    Change("insert", 1L, ts(0), Map("v" -> "a", "city" -> "ber"), 1L),
    Change("update", 2L, ts(5, 123456000), Map("v" -> "b"), 7L), // sub-ms ts
    Change("delete", 3L, ts(9), Map.empty, 2L),
  )

  test("#172a Avro wire round-trips Changes exactly, including sub-ms timestamps") {
    import spark.implicits._
    val wire = AvroWire.toWire(changes.toDS())
    assert(wire.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "binary"), ("value", "binary")))
    val back = AvroWire.fromWire(wire).collect().toSet
    assert(back == changes.toSet, s"round trip drifted: $back")
    // sub-millisecond precision survived (micros on the wire)
    val k2 = back.find(_.key == 2L).get
    assert(CdcMaterializer.micros(k2.ts) == CdcMaterializer.micros(ts(5, 123456000)))
  }

  test("#172b OLD writer schema (no seq field): reader default fills seq = 0") {
    import spark.implicits._
    val oldSchema =
      """{"type":"record","name":"Change","namespace":"graft.wire","fields":[
        |{"name":"op","type":"string"},
        |{"name":"key","type":"long"},
        |{"name":"ts_us","type":"long"},
        |{"name":"payload","type":{"type":"map","values":"string"}}
        |]}""".stripMargin
    // encode WITH the old schema (toWire skips fields the writer schema
    // doesn't declare — exactly how an old producer behaves)
    val wire = AvroWire.toWire(changes.toDS(), oldSchema)
    val back = AvroWire.fromWire(wire, oldSchema).collect().toSet
    assert(back == changes.map(_.copy(seq = 0L)).toSet,
      "pre-seq feeds must decode with the reader's default seq=0")
  }

  test("#172c NEW writer schema (extra field): unknown field is ignored on read") {
    // author the new-producer bytes with the raw Avro API: a writer
    // that also emits a `region` field today's reader doesn't know
    val newSchema = new Schema.Parser().parse(
      """{"type":"record","name":"Change","namespace":"graft.wire","fields":[
        |{"name":"op","type":"string"},
        |{"name":"key","type":"long"},
        |{"name":"ts_us","type":"long"},
        |{"name":"payload","type":{"type":"map","values":"string"}},
        |{"name":"seq","type":"long","default":0},
        |{"name":"region","type":"string"}
        |]}""".stripMargin)
    val writer = new GenericDatumWriter[GenericRecord](newSchema)
    val rows = changes.map { c =>
      val rec = new GenericData.Record(newSchema)
      rec.put("op", c.op)
      rec.put("key", c.key)
      rec.put("ts_us", CdcMaterializer.micros(c.ts))
      rec.put("payload", c.payload.asJava)
      rec.put("seq", c.seq)
      rec.put("region", "eu-west")
      val out = new ByteArrayOutputStream()
      val e   = EncoderFactory.get().binaryEncoder(out, null)
      writer.write(rec, e)
      e.flush()
      (c.key.toString.getBytes("UTF-8"), out.toByteArray)
    }
    import spark.implicits._
    val wire = rows.toDF("key", "value")
    val back = AvroWire.fromWire(wire, newSchema.toString).collect().toSet
    assert(back == changes.toSet, "new-producer extra field must be ignored, everything else intact")
  }

  test("#172d poison blobs drop from fromWire and surface in deadLetters") {
    import spark.implicits._
    val good = AvroWire.toWire(changes.toDS()).collect()
    val poison = Seq(
      Array[Byte](),                                    // empty
      Array[Byte](0x7f, 0x7f, 0x7f, 0x7f, 0x7f, 0x7f), // garbage varints
      good.head.getAs[Array[Byte]]("value") ++ Array[Byte](1, 2, 3), // trailing bytes
    )
    val wire = (good.map(r => (r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"))) ++
      poison.map(b => (Array[Byte](0), b))).toSeq.toDF("key", "value")
    val decoded = AvroWire.fromWire(wire).collect()
    assert(decoded.toSet == changes.toSet, "good records decode; poison must not kill or corrupt")
    assert(AvroWire.deadLetters(wire).count() == poison.size.toLong,
      "every poison blob must be dead-lettered")
  }

  test("#172e Avro wire feeds a streaming materialization end to end") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Change]
    val q = CdcMaterializer
      .materialize(AvroWire.fromWire(AvroWire.toWire(input.toDS())))
      .writeStream.format("memory").queryName("avro_cdc").outputMode(OutputMode.Update())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("avro_cdc").toString)
      .start()
    try {
      input.addData(changes: _*)
      q.processAllAvailable()
      val state = spark.table("avro_cdc").collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[Boolean]("deleted"))).toMap
      assert(state(1L) == false && state(2L) == false && state(3L) == true)
    } finally q.stop()
  }
}
