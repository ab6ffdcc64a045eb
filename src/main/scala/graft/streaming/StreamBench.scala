package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Streaming throughput smoke: rate source -> Change records ->
  * materializer -> null sink, reporting rows/s and latency. Not part of
  * the driver bench contract — run manually:
  * `sbt "runMain graft.streaming.StreamBench [rowsPerSec] [seconds] [liveKeys] [engine]"`
  * where engine is:
  *
  *  - `v1` — CdcMaterializer (flatMapGroupsWithState fold, HDFS-backed
  *    state);
  *  - `v2` — [[StateMaterializer]] transformWithState on the RocksDB
  *    provider (the 100 TB-cardinality configuration);
  *  - `transitions` — the #163 live Markov view's step extractor;
  *  - `planner-agg` — an [[IncrementalPlanner]] filtered grouped
  *    aggregate view (`WHERE … GROUP BY city`), the chained two-stage
  *    fold that is the planner's flagship dataflow;
  *  - `planner-join` — an [[IncrementalPlanner]] VALUE-equi join view
  *    (two rate feeds arranged by join value), the arrangement-class
  *    dataflow;
  *  - `planner-asof` — an ASOF JOIN view (events re-enriched against a
  *    churning version feed through the as-of bucket fold);
  *  - `planner-ranked` — a top-10-per-city ranked view (row_number +
  *    rank cut), the FULL-partition-state class whose knee arrives
  *    first as keys accumulate.
  *
  * Latency: when the emitted rows carry their change's event time
  * (`tsUs`/`ts_us`, stamped at ingest by the rate source), the wall
  * clock at batch end minus the row's event time IS its end-to-end
  * ingest→emit latency — aggregated as a 10 ms-bucket histogram (exact
  * per-record accounting at ±10 ms resolution, no sampling). Aggregate
  * views suppress no-change groups and emit deltas without an event
  * column, so for them the published latency is the micro-batch
  * duration percentiles (processing latency; ingest→emit adds at most
  * one trigger interval on top).
  */
object StreamBench {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("suite")) suite(args.drop(1))
    else single(args)

  /** `suite [outPath]` — the per-round MACHINE-READABLE streaming bench
    * artifact (the cross-round comparable the SURVEY's prose numbers
    * were not): the six planner dataflow classes (filtered grouped
    * aggregate, value-equi join, as-of join, generator, sessionized
    * aggregate, ranked — the last at a doubled window, see below) at 1M
    * live keys, each
    * reporting offered/achieved rate, emitted rows, latency and
    * micro-batch percentiles, and state rows+bytes — PLUS the q01
    * batch normalizer (min-of-3 on `SPARK_GRAFT_SF_DIR`, default
    * sf0.1) so a round-over-round reader can factor out host speed.
    * One JSON object to `outPath` (default bench/streambench.json);
    * commit a copy as STREAMBENCH_r{N}.json per round.
    */
  def suite(args: Array[String]): Unit = {
    val outPath  = args.headOption.getOrElse("bench/streambench.json")
    val seconds  = args.drop(1).headOption.map(_.toInt).getOrElse(25)
    val liveKeys = args.drop(2).headOption.map(_.toInt).getOrElse(1000000)
    val offered  = args.drop(3).headOption.map(_.toInt).getOrElse(1000000)
    // 5th arg `rocksdb` pins the RocksDB provider (the 100 TB-state
    // configuration) for the whole suite — committed beside the
    // default-provider artifact as STREAMBENCH_r{N}_rocksdb.json
    val provider = args.drop(4).headOption.getOrElse("hdfs")
    val cpus     = Runtime.getRuntime.availableProcessors()
    val spark    = GraftSession.local(cpus)
    if (provider == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.sparkContext.setLogLevel("WARN")
    // q01 normalizer first (deterministic batch work before the
    // streaming queries touch the session): min-of-3 full evaluation
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val normSec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q01_filter_project")(spark, sfDir)
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.min
    val lines = Seq("planner-agg", "planner-join", "planner-asof", "planner-gen",
        "planner-session", "planner-ranked").map { engine =>
      // the ranked class legitimately runs ~10s micro-batches at 1M
      // keys (full-partition rank maintenance), and the join/asof
      // classes the heaviest state writes (arrangement rows ≈ 2× live
      // keys → ~40s batches at 10M keys on RocksDB); double their
      // windows so the steady-state measurement sees enough completed
      // batches past the 2-batch warmup (the r14 under-sampling lesson,
      // re-learned at 10M where asof joined the heavy set)
      val window =
        if (engine == "planner-ranked" || engine == "planner-join" ||
          engine == "planner-asof") seconds * 2
        else seconds
      runOne(spark, engine, offered, window, liveKeys)
    }
    val json =
      s"""{"metric":"stream_bench_suite","cpus":$cpus,"live_keys":$liveKeys,""" +
        s""""offered_rows_per_sec":$offered,"seconds_per_engine":$seconds,""" +
        s""""state_provider":"$provider",""" +
        f""""normalizer":"q01_filter_project","normalizer_sec":$normSec%.4f,""" +
        s""""dataflows":[${lines.mkString(",")}]}"""
    println(json)
    val p = java.nio.file.Paths.get(outPath)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }

  private def single(args: Array[String]): Unit = {
    val rowsPerSec = args.headOption.map(_.toInt).getOrElse(200000)
    val seconds    = args.drop(1).headOption.map(_.toInt).getOrElse(15)
    val liveKeys   = args.drop(2).headOption.map(_.toInt).getOrElse(100000)
    val engine     = args.drop(3).headOption.getOrElse("v1")
    // 5th arg `rocksdb` pins the RocksDB provider for ANY engine — the
    // 100 TB-cardinality state configuration, probeable per dataflow
    val provider   = args.drop(4).headOption.getOrElse("")
    val spark      = GraftSession.local(Runtime.getRuntime.availableProcessors())
    if (engine == "v2" || provider == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    println(runOne(spark, engine, rowsPerSec, seconds, liveKeys))
    spark.stop()
  }

  /** One dataflow run → its metrics as a JSON object string (shared by
    * [[single]] and [[suite]]; the caller owns the session).
    */
  private def runOne(spark: org.apache.spark.sql.SparkSession, engine: String,
      rowsPerSec: Int, seconds: Int, liveKeys: Int): String = {
    import spark.implicits._

    /** A rate-derived changefeed: 10% deletes, keys recycled over
      * `liveKeys`, the rate counter as a monotone LSN, and payload
      * fields for the planner views (city ~500 groups, amount 0–999,
      * grp `liveKeys/4` join values ≈ 4×4 bucket cross products).
      */
    def rateChanges(tag: String): org.apache.spark.sql.Dataset[Change] = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSec)
      .load()
      .select(
        when(pmod(col("value"), lit(10)) === 0, "delete").otherwise("update").as("op"),
        pmod(col("value"), lit(liveKeys)).as("key"),
        col("timestamp").as("ts"),
        map(
          lit("value"), col("value").cast("string"),
          lit("city"), concat(lit("c"), pmod(col("value"), lit(500))),
          // 997 is coprime to the key space, so a key's amount CHANGES
          // on every update (with % 1000 it would be constant per key
          // and stage-1 suppression would zero the downstream load)
          lit("amount"), pmod(col("value"), lit(997)).cast("string"),
          lit("grp"), pmod(col("value"), lit(math.max(1, liveKeys / 4))).cast("string"),
          lit(tag), concat(lit(tag), col("value"))).as("payload"),
        col("value").as("seq"),
      )
      .as[Change]

    val counter = spark.sparkContext.longAccumulator("processed")
    val (materialized, outMode) = engine match {
      case "transitions" =>
        val df = TransitionView.steps(
          spark.readStream.format("rate").option("rowsPerSecond", rowsPerSec).load()
            .select(
              col("value").as("eventId"),
              pmod(col("value"), lit(liveKeys)).as("key"),
              col("timestamp").as("ts"),
              concat(lit("t"), pmod(col("value"), lit(7))).as("eventType"))
            .as[TypedEvent]).toDF()
        (df, org.apache.spark.sql.streaming.OutputMode.Append())
      case "planner-agg" =>
        val planned = IncrementalPlanner.materialize(spark,
          "SELECT city, count(*) AS n, sum(amount) AS total FROM t WHERE amount > 100 GROUP BY city",
          Map("t" -> rateChanges("name")))
        (planned.df, planned.outputMode)
      case "planner-join" =>
        val planned = IncrementalPlanner.materialize(spark,
          "SELECT l.name AS name, r.tag AS tag FROM a l JOIN b r ON l.grp = r.grp",
          Map("a" -> rateChanges("name"), "b" -> rateChanges("tag")))
        (planned.df, planned.outputMode)
      case "planner-asof" =>
        // events enrich against a churning version feed: the as-of
        // bucket fold re-selects each event's latest admissible version
        val planned = IncrementalPlanner.materialize(spark,
          "SELECT e.name AS name, v.tag AS tag FROM a e ASOF JOIN b v " +
            "ON e.grp = v.grp AND e.amount >= v.amount",
          Map("a" -> rateChanges("name"), "b" -> rateChanges("tag")))
        (planned.df, planned.outputMode)
      case "planner-ranked" =>
        // the RANKED dataflow — the known-heavy class: rank maintenance
        // holds FULL per-partition state (every live row of a city can
        // shift rank when one row moves), so its knee arrives first as
        // keys accumulate. Top-10 per city over ~500 cities at 1M live
        // keys = ~2000 rows per partition state; every update moves its
        // key's amount (coprime modulus), churning ranks continuously —
        // the honest worst case, not the static-rank best case.
        val planned = IncrementalPlanner.materialize(spark,
          "SELECT city, name, rn FROM (SELECT city, name, " +
            "row_number() OVER (PARTITION BY city ORDER BY amount DESC, name) AS rn FROM t) x " +
            "WHERE rn <= 10",
          Map("t" -> rateChanges("name")))
        (planned.df, planned.outputMode)
      case "planner-session" =>
        // SESSIONIZATION — the heaviest aggregate state shape (per-group
        // event-time SETS with session merge/split under retraction):
        // 10k users × (liveKeys/10k) event slots spaced 7 s apart under
        // a 10 s gap, so arrivals MERGE a user's sessions as slots fill
        // and the 10% deletes SPLIT them back; the coprime amount churn
        // keeps every update a real delta (no stage-1 suppression).
        val feed = spark.readStream
          .format("rate")
          .option("rowsPerSecond", rowsPerSec)
          .load()
          .select(
            when(pmod(col("value"), lit(10)) === 0, "delete").otherwise("update").as("op"),
            pmod(col("value"), lit(liveKeys)).as("key"),
            col("timestamp").as("ts"),
            map(
              lit("user"), concat(lit("u"), pmod(col("value"), lit(10000))),
              lit("ev"), expr(s"CAST((pmod(value, $liveKeys) div 10000) * 7000000 AS STRING)"),
              lit("amount"), pmod(col("value"), lit(997)).cast("string")).as("payload"),
            col("value").as("seq"),
          )
          .as[Change]
        val planned = IncrementalPlanner.materialize(spark,
          "SELECT user, session_window(ev, '10 seconds') AS sw, count(*) AS n, " +
            "sum(amount) AS total FROM t GROUP BY user, session_window(ev, '10 seconds')",
          Map("t" -> feed))
        (planned.df, planned.outputMode)
      case "planner-gen" =>
        // the generator dataflow: every update rewrites a 4-element
        // family (each element derived from the LSN with a distinct
        // coprime modulus, so all ordinals change every update — the
        // worst case for the per-ordinal diff: 4 emissions per input
        // row, plus family deletes on the 10% tombstones)
        val feed = spark.readStream
          .format("rate")
          .option("rowsPerSecond", rowsPerSec)
          .load()
          .select(
            when(pmod(col("value"), lit(10)) === 0, "delete").otherwise("update").as("op"),
            pmod(col("value"), lit(liveKeys)).as("key"),
            col("timestamp").as("ts"),
            map(
              lit("city"), concat(lit("c"), pmod(col("value"), lit(500))),
              lit("tags"), concat(
                lit("a"), pmod(col("value"), lit(97)), lit(","),
                lit("b"), pmod(col("value"), lit(89)), lit(","),
                lit("c"), pmod(col("value"), lit(83)), lit(","),
                lit("d"), pmod(col("value"), lit(79)))).as("payload"),
            col("value").as("seq"),
          )
          .as[Change]
        val planned = IncrementalPlanner.materialize(spark,
          "SELECT city, explode(split(tags, ',')) AS tag FROM t",
          Map("t" -> feed))
        (planned.df, planned.outputMode)
      case "v2" => (StateMaterializer.materialize(rateChanges("name")).toDF(), CdcMaterializer.outputMode)
      case _    => (CdcMaterializer.materialize(rateChanges("name")).toDF(), CdcMaterializer.outputMode)
    }
    val latHist = scala.collection.mutable.Map.empty[Long, Long] // lat_ms/10 -> rows
    // per-leg scratch checkpoint, DELETED after the leg: at 10M keys a
    // six-leg suite otherwise accretes ~40 GB of dead state snapshots
    // (measured — it filled the disk mid-run in r15)
    val ckDir = s"target/streambench-ck-${System.nanoTime()}"
    val q = materialized
      .writeStream
      .outputMode(outMode)
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val tsCol = Seq("tsUs", "ts_us").find(batch.columns.contains)
        tsCol match {
          case Some(c) =>
            val h = batch.select(expr(s"$c div 10000").as("b")).groupBy("b").count().collect()
            val tEnd = System.currentTimeMillis()
            counter.add(h.map(_.getAs[Long]("count")).sum)
            h.foreach { r => // foreachBatch is driver-serial per query
              val latMs = math.max(0L, tEnd - r.getAs[Long]("b") * 10L)
              latHist(latMs / 10) = latHist.getOrElse(latMs / 10, 0L) + r.getAs[Long]("count")
            }
          case None => counter.add(batch.count())
        }
      }
      .start()

    val t0 = System.nanoTime()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress.toSeq // snapshot before stop
    q.stop()
    val elapsed = (System.nanoTime() - t0) / 1e9
    scala.util.Try {
      val root = java.nio.file.Paths.get(ckDir)
      if (java.nio.file.Files.isDirectory(root))
        java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
    }: Unit
    def pct(hist: Map[Long, Long], q: Double): Long = {
      val total = hist.values.sum
      var acc   = 0L
      hist.toSeq.sortBy(_._1).foreach { case (b, n) =>
        acc += n
        if (acc >= total * q) return b * 10
      }
      hist.keys.maxOption.getOrElse(0L) * 10
    }
    // achieved ingest rate + micro-batch durations from query progress
    val inputRows = progress.map(_.numInputRows).sum
    val batchMs   = progress.map(_.batchDuration).sorted
    def bPct(q: Double): Long =
      if (batchMs.isEmpty) 0L else batchMs(math.min(batchMs.length - 1, (batchMs.length * q).toInt))
    // STEADY-state capacity: rows per second of BATCH PROCESSING time
    // over completed batches past warmup (first two batches carry
    // planning + the 1M-key state initialization), so neither setup
    // dead time nor the cut-off in-flight batch dilutes the rate. This
    // is the cross-round comparable; `achieved_rows_per_sec` (rows /
    // wall clock) stays for transparency.
    val steady = {
      val usable = progress.drop(2).filter(_.batchDuration > 0)
      val rows   = usable.map(_.numInputRows).sum
      val secs   = usable.map(_.batchDuration).sum / 1000.0
      if (secs > 0) (rows / secs).toLong else 0L
    }
    val lat = latHist.toMap
    // state-store footprint at the last progress tick: total live state
    // rows across every stateful operator and their in-memory bytes —
    // the number that decides whether the dataflow's arrangement math
    // holds at the probed key cardinality
    val lastState  = progress.lastOption.map(_.stateOperators.toSeq).getOrElse(Nil)
    val stateRows  = lastState.map(_.numRowsTotal).sum
    val stateBytes = lastState.map(_.memoryUsedBytes).sum
    f"""{"metric":"stream_bench","engine":"$engine","input_rows_per_sec":$rowsPerSec,"achieved_rows_per_sec":${(inputRows / math.max(elapsed, 0.001)).toLong},"steady_rows_per_sec":$steady,"batches_completed":${progress.length},"elapsed_sec":$elapsed%.1f,"rows_emitted":${counter.value},"lat_p50_ms":${pct(lat, 0.5)},"lat_p99_ms":${pct(lat, 0.99)},"batch_p50_ms":${bPct(0.5)},"batch_p99_ms":${bPct(0.99)},"state_rows":$stateRows,"state_bytes":$stateBytes}"""
  }
}
