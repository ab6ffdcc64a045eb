package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Streaming throughput smoke: rate source -> Change records ->
  * materializer -> null sink, reporting rows/s. Not part of the driver
  * bench contract — run manually:
  * `sbt "runMain graft.streaming.StreamBench [rowsPerSec] [seconds] [liveKeys] [engine]"`
  * where engine is `v1` (flatMapGroupsWithState fold, HDFS-backed state)
  * or `v2` ([[StateMaterializer]] transformWithState on the RocksDB
  * provider — the 100 TB-cardinality configuration).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPerSec = args.headOption.map(_.toInt).getOrElse(200000)
    val seconds    = args.drop(1).headOption.map(_.toInt).getOrElse(15)
    val liveKeys   = args.drop(2).headOption.map(_.toInt).getOrElse(100000)
    val engine     = args.drop(3).headOption.getOrElse("v1")
    val spark      = GraftSession.local(Runtime.getRuntime.availableProcessors())
    if (engine == "v2")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    val changes = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSec)
      .load()
      .select(
        when(pmod(col("value"), lit(10)) === 0, "delete").otherwise("update").as("op"),
        pmod(col("value"), lit(liveKeys)).as("key"),
        col("timestamp").as("ts"),
        map(lit("value"), col("value").cast("string")).as("payload"),
        col("value").as("seq"), // the rate counter is a natural monotone LSN
      )
      .as[Change]

    val counter = spark.sparkContext.longAccumulator("processed")
    // `transitions` engine: rate source -> TypedEvents -> #163's step
    // extractor (per-key last-event state over `liveKeys` keys) — the
    // live Markov view's hot path, measured on the same harness
    val materialized =
      if (engine == "transitions")
        TransitionView.steps(
          spark.readStream.format("rate").option("rowsPerSecond", rowsPerSec).load()
            .select(
              col("value").as("eventId"),
              pmod(col("value"), lit(liveKeys)).as("key"),
              col("timestamp").as("ts"),
              concat(lit("t"), pmod(col("value"), lit(7))).as("eventType"))
            .as[TypedEvent]).toDF()
      else if (engine == "v2") StateMaterializer.materialize(changes).toDF()
      else CdcMaterializer.materialize(changes).toDF()
    // Ingest→emit latency, per record: every emitted row carries its
    // change's event time (tsUs, stamped by the rate source at ingest);
    // at batch END (results available = emitted) the wall clock minus
    // the row's event time IS its end-to-end latency. Aggregated as a
    // 10 ms-bucket histogram of event times per batch (one small
    // collect), converted to latencies with the batch-end clock —
    // exact per-record accounting at ±10 ms resolution, no sampling.
    val latHist = scala.collection.mutable.Map.empty[Long, Long] // lat_ms/10 -> rows
    val q = materialized
      .writeStream
      .outputMode(
        if (engine == "transitions") org.apache.spark.sql.streaming.OutputMode.Append()
        else CdcMaterializer.outputMode)
      .option("checkpointLocation", s"target/streambench-ck-${System.nanoTime()}")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val h = batch.select(expr("tsUs div 10000").as("b")).groupBy("b").count().collect()
        val tEnd = System.currentTimeMillis()
        counter.add(h.map(_.getAs[Long]("count")).sum)
        h.foreach { r => // foreachBatch is driver-serial per query
          val latMs = math.max(0L, tEnd - r.getAs[Long]("b") * 10L)
          latHist(latMs / 10) = latHist.getOrElse(latMs / 10, 0L) + r.getAs[Long]("count")
        }
      }
      .start()

    val t0 = System.nanoTime()
    Thread.sleep(seconds * 1000L)
    q.stop()
    val elapsed = (System.nanoTime() - t0) / 1e9
    def pct(q: Double): Long = {
      val total = latHist.values.sum
      var acc   = 0L
      latHist.toSeq.sortBy(_._1).foreach { case (b, n) =>
        acc += n
        if (acc >= total * q) return b * 10
      }
      latHist.keys.maxOption.getOrElse(0L) * 10
    }
    // rows ingested = rate * elapsed (approx); state rows emitted = counter
    println(f"""{"metric":"cdc_materialize","engine":"$engine","input_rows_per_sec":$rowsPerSec,"elapsed_sec":$elapsed%.1f,"state_rows_emitted":${counter.value},"lat_p50_ms":${pct(0.5)},"lat_p99_ms":${pct(0.99)}}""")
    spark.stop()
  }
}
