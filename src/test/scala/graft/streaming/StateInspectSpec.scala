package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2.5 #187 — offline state-store introspection: read a
  * (stopped or live) streaming query's state through the Spark 4
  * state reader, time-travel to earlier batches, and diff two batches —
  * the on-call surface for "what does the view hold for key K, and
  * what changed?".
  */
class StateInspectSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val root = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(root)
    Files.createTempDirectory(root, prefix).toString
  }

  test("#187 state reader: latest state, batch time-travel, and the two-batch diff") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt  = tmp("inspect")
    val input = MemoryStream[(String, Long)]
    val counts = input.toDS().toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
    val q = counts.writeStream.format("memory").queryName("si_live")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      input.addData("a" -> 1L, "a" -> 2L, "b" -> 10L) // batch 0: a=(2,3) b=(1,10)
      q.processAllAvailable()
      input.addData("a" -> 4L, "c" -> 7L)             // batch 1: a=(3,7) c=(1,7)
      q.processAllAvailable()
    } finally q.stop()

    // the metadata surface names the stateful operator and its batch range
    val ops = StateInspect.operators(spark, ckpt).collect()
    assert(ops.length == 1)
    assert(ops.head.getAs[String]("operatorName") == "stateStoreSave")
    assert(ops.head.getAs[Long]("minBatchId") == 0L && ops.head.getAs[Long]("maxBatchId") == 1L)

    def stateAt(batch: Long): Map[String, (Long, Long)] =
      StateInspect.store(spark, ckpt, batchId = batch).collect().map { r =>
        val k = r.getStruct(r.fieldIndex("key")).getString(0)
        val v = r.getStruct(r.fieldIndex("value"))
        k -> ((v.getAs[Long]("count"), v.getAs[Long]("sum"))) // internal buffer field names
      }.toMap

    // latest state == what the live query last knew
    val latest = StateInspect.store(spark, ckpt).collect().map { r =>
      r.getStruct(r.fieldIndex("key")).getString(0)
    }.toSet
    assert(latest == Set("a", "b", "c"))
    assert(stateAt(1L) == Map("a" -> ((3L, 7L)), "b" -> ((1L, 10L)), "c" -> ((1L, 7L))))
    // time travel: batch 0 predates c and a's second contribution
    assert(stateAt(0L) == Map("a" -> ((2L, 3L)), "b" -> ((1L, 10L))))

    // the diff names exactly the keys that changed 0 → 1
    val d = StateInspect.diff(spark, ckpt, 0L, 1L).collect().map { r =>
      r.getStruct(r.fieldIndex("key")).getString(0) ->
        (Option(r.getStruct(r.fieldIndex("before"))).map(_.getAs[Long]("count")),
         Option(r.getStruct(r.fieldIndex("after"))).map(_.getAs[Long]("count")))
    }.toMap
    assert(d == Map("a" -> ((Some(2L), Some(3L))), "c" -> ((None, Some(1L)))),
      s"diff must be {a changed, c appeared}: $d")
  }

  test("#187b planner-view state is inspectable: stage-2 group state readable from the checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt  = tmp("inspectpv")
    val input = MemoryStream[Change]
    val planned = IncrementalPlanner.materialize(
      spark, "SELECT city, count(*) AS n FROM t GROUP BY city", Map("t" -> input.toDS()))
    val q = planned.df.writeStream.format("memory").queryName("si_pv")
      .outputMode(planned.outputMode)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(
        Change("insert", 1L, new java.sql.Timestamp(0), Map("city" -> "ber"), 1L),
        Change("insert", 2L, new java.sql.Timestamp(1), Map("city" -> "par"), 2L))
      q.processAllAvailable()
    } finally q.stop()
    // both planner stages appear in the metadata; their stores are readable
    val ops = StateInspect.operators(spark, ckpt).collect()
    assert(ops.length >= 1, "planner view must expose stateful operators")
    val readable = ops.map(_.getAs[Long]("operatorId")).map { oid =>
      StateInspect.store(spark, ckpt, operatorId = oid).count()
    }
    assert(readable.forall(_ > 0), s"every planner store must be readable: $readable")
  }

  test("#187c generator-view state is inspectable: the family fold's store holds one row per source key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt  = tmp("inspectgen")
    val input = MemoryStream[Change]
    val planned = IncrementalPlanner.materialize(
      spark, "SELECT city, explode(split(tags, ',')) AS tag FROM t", Map("t" -> input.toDS()))
    val q = planned.df.writeStream.format("memory").queryName("si_gen")
      .outputMode(planned.outputMode)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(
        Change("insert", 1L, new java.sql.Timestamp(0), Map("city" -> "ber", "tags" -> "a,b,c"), 1L),
        Change("insert", 2L, new java.sql.Timestamp(1), Map("city" -> "par", "tags" -> "x"), 2L))
      q.processAllAvailable()
    } finally q.stop()
    // state is keyed by SOURCE key (the family), not by emitted ordinal:
    // 2 source keys → 2 state rows, though 4 family rows were emitted
    val ops = StateInspect.operators(spark, ckpt).collect()
    assert(ops.length == 1, "one family fold")
    assert(StateInspect.store(spark, ckpt).count() == 2L,
      "the on-call surface reads the family state: one row per source key")
  }
}
