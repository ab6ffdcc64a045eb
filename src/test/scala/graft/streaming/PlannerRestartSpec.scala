package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2.3 #220 — planner-view RESTART CONTINUITY: the flagship
  * `IncrementalPlanner.materialize` dataflows stopped mid-feed and
  * resumed from their checkpoints by a NEW query (the redeploy story).
  * Each test proves (a) the final view equals batch recompute of the
  * same SQL over the feed's full final LWW state, and (b) the
  * post-restart emissions could only have come from CHECKPOINTED state
  * (a retraction promotes / re-enriches from a contribution that
  * arrived before the stop), i.e. state continued rather than reset —
  * the #163/#173 restart discipline applied to the planner surface.
  *
  * Transport: the changefeed file source (#31) — the one graft source
  * whose offsets live in the checkpoint — with a foreachBatch parquet
  * sink, exactly the production redeploy shape.
  */
class PlannerRestartSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  private def tmp(prefix: String): String = {
    val root = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(root)
    Files.createTempDirectory(root, prefix).toString
  }

  /** Hand-rendered Change JSON lines (full-microsecond ISO ts — the #31
    * wire); payload values in these fixtures are JSON-safe by
    * construction.
    */
  private def writeChanges(dir: String, name: String, cs: Seq[Change]): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val lines = cs.map { c =>
      val iso = java.time.Instant.ofEpochSecond(0, CdcMaterializer.micros(c.ts) * 1000L).toString
      val payload = c.payload.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
      s"""{"op":"${c.op}","key":${c.key},"ts":"$iso","payload":{$payload},"seq":${c.seq}}"""
    }
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))
  }

  /** One deployment: compile the SQL over file-source feeds, run to
    * drain against the shared checkpoint, stop. Every call builds the
    * query from scratch — the second call IS the redeploy.
    */
  private def deploy(sql: String, feedDirs: Map[String, String], ck: String, outDir: String,
      build: (String, Map[String, Dataset[Change]]) => IncrementalPlanner.PlannedView =
        (s, f) => IncrementalPlanner.materialize(spark, s, f)): Unit = {
    val feeds = feedDirs.map { case (n, d) => n -> ChangeFeed.readJsonDir(spark, d).as[Change] }
    val pv = build(sql, feeds)
    val q = pv.df.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id)).write.mode("append").parquet(outDir)
      }
      .outputMode(pv.outputMode)
      .option("checkpointLocation", ck)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Final live state of an aggregate view's parquet log: per group, the
    * max-batch emission (a group emits at most once per batch; replayed
    * batches append identical rows, so max-batch is replay-proof).
    */
  private def aggFinal(outDir: String, groupCols: Seq[String], valCols: Seq[String]): Map[Seq[Any], Seq[Any]] =
    spark.read.parquet(outDir).collect().toSeq
      .groupBy(r => groupCols.map(c => r.getAs[Any](c)))
      .view.mapValues(_.maxBy(_.getAs[Long]("batch_id")))
      .collect { case (g, r) if r.getAs[Long]("_live_rows") > 0L => g -> valCols.map(c => r.getAs[Any](c)) }
      .toMap

  /** Fold a row-changefeed parquet log into final state by commit
    * position — the view consumer's documented LWW fold.
    */
  private def rowFinal(outDir: String, cols: Seq[String]): Map[Long, Seq[Any]] =
    spark.read.parquet(outDir).dropDuplicates("key", "ts_us", "seq", "op").collect().toSeq
      .sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("seq")))
      .foldLeft(Map.empty[Long, Seq[Any]]) { (m, r) =>
        if (r.getAs[String]("op") == "delete") m - r.getAs[Long]("key")
        else m + (r.getAs[Long]("key") -> cols.map(c => r.getAs[Any](c)))
      }

  /** Batch LWW fold of a change list → final live payloads by key. */
  private def finalState(changes: Seq[Change]): Map[Long, Map[String, String]] =
    changes.groupBy(_.key)
      .view.mapValues { cs =>
        val last = cs.sortBy(c => (CdcMaterializer.micros(c.ts), c.seq)).last
        if (last.op == "delete") None else Some(last.payload)
      }
      .collect { case (k, Some(p)) => k -> p }
      .toMap

  // ----------------------------------------------------------------

  test("#220a aggregate view restart: sums continue, deleted max re-emits PRE-restart next-best, stale-drop survives") {
    val sql = "SELECT city, count(*) AS n, sum(amount) AS total, max(amount) AS hi FROM t GROUP BY city"
    val (src, ck, out) = (tmp("rsaggsrc"), tmp("rsaggck"), tmp("rsaggout"))
    val half1 = Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "amount" -> "10"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "ber", "amount" -> "50"), 2L), // the max
      Change("insert", 3L, ts(2), Map("city" -> "ber", "amount" -> "30"), 3L), // the next-best
      Change("insert", 4L, ts(3), Map("city" -> "par", "amount" -> "7"), 4L),
      Change("update", 3L, ts(8), Map("city" -> "ber", "amount" -> "30"), 5L))
    val half2 = Seq(
      Change("delete", 2L, ts(10), Map.empty, 6L),   // retracts the max: needs half-1 keyed state
      Change("update", 3L, ts(5), Map("city" -> "xxx", "amount" -> "999"), 1L), // STALE vs half-1 position (8,5)
      Change("insert", 5L, ts(11), Map("city" -> "par", "amount" -> "3"), 7L),
      Change("delete", 4L, ts(12), Map.empty, 8L))
    writeChanges(src, "f1.json", half1)
    deploy(sql, Map("t" -> src), ck, out)
    writeChanges(src, "f2.json", half2)
    deploy(sql, Map("t" -> src), ck, out) // the redeploy
    val got = aggFinal(out, Seq("city"), Seq("n", "total", "hi"))
    val fs = finalState(half1 ++ half2)
    val want = fs.values.toSeq.groupBy(_("city")).map { case (c, ps) =>
      Seq[Any](c) -> Seq[Any](ps.size.toLong, ps.map(_("amount").toDouble).sum, ps.map(_("amount").toDouble).max)
    }
    assert(got == want, s"restarted agg view $got != batch $want")
    // ber's max fell back to 30 — a value only the CHECKPOINTED keyed
    // min/max state knew (never re-sent after the restart)
    assert(got(Seq("ber")) == Seq[Any](2L, 40.0, 30.0))
    // the stale change did NOT apply: city stayed ber (state positions survived)
    assert(!got.contains(Seq[Any]("xxx")), s"stale change resurrected across restart: $got")
  }

  test("#220b bounded ranked view restart: deleting the leader PROMOTES a pre-restart member past the cut") {
    val sql = "SELECT name, rn FROM (SELECT city, name, " +
      "row_number() OVER (PARTITION BY city ORDER BY score DESC) AS rn FROM t) x WHERE rn <= 2"
    val (src, ck, out) = (tmp("rsrnksrc"), tmp("rsrnkck"), tmp("rsrnkout"))
    def ins(k: Long, city: String, name: String, score: Int, seq: Long) =
      Change("insert", k, ts(seq.toInt), Map("city" -> city, "name" -> name, "score" -> score.toString), seq)
    val half1 = Seq(ins(1L, "ber", "a", 50, 1L), ins(2L, "ber", "b", 40, 2L), ins(3L, "ber", "c", 30, 3L))
    val half2 = Seq(Change("delete", 1L, ts(10), Map.empty, 4L))
    writeChanges(src, "f1.json", half1)
    deploy(sql, Map("t" -> src), ck, out)
    val run1MaxBatch = spark.read.parquet(out).agg(max("batch_id")).as[Long].head()
    writeChanges(src, "f2.json", half2)
    deploy(sql, Map("t" -> src), ck, out)
    // final: b at 1, c promoted to 2 — c's row was NEVER emitted before
    // the restart (it sat outside the cut in checkpointed partition state)
    val log = spark.read.parquet(out)
    val fin = log.collect().toSeq
      .sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("seq")))
      .foldLeft(Map.empty[(Long, String), Seq[Any]]) { (m, r) =>
        val id = (r.getAs[Long]("key"), r.getAs[String]("_partition"))
        if (r.getAs[String]("op") == "delete") m - id
        else m + (id -> Seq[Any](r.getAs[String]("name"), r.getAs[Long]("rn")))
      }
    assert(fin == Map((2L, "ber") -> Seq[Any]("b", 1L), (3L, "ber") -> Seq[Any]("c", 2L)),
      s"restarted ranked view: $fin")
    val preRestart = log.filter(col("batch_id") <= run1MaxBatch)
      .select("op", "key", "rn", "batch_id").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Any](2), r.getAs[Long](3)))
    assert(!preRestart.exists(p => p._1 == "upsert" && p._2 == 3L),
      s"key 3 must be below the cut before the restart: $preRestart")
  }

  test("#220c value-join view restart: partner update fans out over the pre-restart arrangement; delete retracts a pre-restart pair") {
    val sql = "SELECT l.name AS name, r.tag AS tag FROM t1 l JOIN t2 r ON l.city = r.city"
    val (srcL, srcR, ck, out) = (tmp("rsvjl"), tmp("rsvjr"), tmp("rsvjck"), tmp("rsvjout"))
    val lHalf1 = Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "name" -> "a"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "ber", "name" -> "b"), 2L),
      Change("insert", 3L, ts(2), Map("city" -> "par", "name" -> "c"), 3L))
    val rHalf1 = Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "tag" -> "x"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "par", "tag" -> "y"), 2L))
    // after restart: the right ber row re-tags (fan-out to BOTH left
    // partners held only in checkpointed arrangement state), and the
    // par pair dies from the left side
    val rHalf2 = Seq(Change("update", 1L, ts(10), Map("city" -> "ber", "tag" -> "x2"), 3L))
    val lHalf2 = Seq(Change("delete", 3L, ts(11), Map.empty, 4L))
    writeChanges(srcL, "f1.json", lHalf1)
    writeChanges(srcR, "f1.json", rHalf1)
    deploy(sql, Map("t1" -> srcL, "t2" -> srcR), ck, out)
    writeChanges(srcL, "f2.json", lHalf2)
    writeChanges(srcR, "f2.json", rHalf2)
    deploy(sql, Map("t1" -> srcL, "t2" -> srcR), ck, out)
    val got = rowFinal(out, Seq("name", "tag")).values.toSeq.sortBy(_.mkString("|"))
    val lDf = finalState(lHalf1 ++ lHalf2).values.toSeq.map(p => (p("city"), p("name"))).toDF("city", "name")
    val rDf = finalState(rHalf1 ++ rHalf2).values.toSeq.map(p => (p("city"), p("tag"))).toDF("city", "tag")
    val want = lDf.join(rDf, "city").select("name", "tag").collect()
      .map(r => Seq[Any](r.getString(0), r.getString(1))).toSeq.sortBy(_.mkString("|"))
    assert(got == want, s"restarted value join\n  $got\n  != batch\n  $want")
    assert(got == Seq(Seq[Any]("a", "x2"), Seq[Any]("b", "x2")),
      "both pre-restart partners must re-pair with the new tag")
  }

  test("#220d ASOF view restart: a late version re-enriches an event held only in checkpointed state") {
    val sql = "SELECT e.val AS val, v.price AS price FROM e ASOF JOIN v ON e.sym = v.sym AND e.ets >= v.vts"
    val (srcE, srcV, ck, out) = (tmp("rsase"), tmp("rsasv"), tmp("rsasck"), tmp("rsasout"))
    val eHalf1 = Seq(
      Change("insert", 1L, ts(0), Map("sym" -> "A", "ets" -> "15", "val" -> "x1"), 1L),
      Change("insert", 2L, ts(1), Map("sym" -> "A", "ets" -> "25", "val" -> "x2"), 2L))
    val vHalf1 = Seq(
      Change("insert", 1L, ts(0), Map("sym" -> "A", "vts" -> "10", "price" -> "100"), 1L),
      Change("insert", 2L, ts(1), Map("sym" -> "A", "vts" -> "20", "price" -> "200"), 2L))
    // the late version lands BETWEEN v1 and e1 after the redeploy: e1
    // (absent from the post-restart feed) must re-pair from state
    val vHalf2 = Seq(Change("insert", 3L, ts(10), Map("sym" -> "A", "vts" -> "12", "price" -> "120"), 3L))
    writeChanges(srcE, "f1.json", eHalf1)
    writeChanges(srcV, "f1.json", vHalf1)
    deploy(sql, Map("e" -> srcE, "v" -> srcV), ck, out)
    writeChanges(srcV, "f2.json", vHalf2)
    deploy(sql, Map("e" -> srcE, "v" -> srcV), ck, out)
    val got = rowFinal(out, Seq("val", "price")).values.toSeq.sortBy(_.mkString("|"))
    assert(got == Seq(Seq[Any]("x1", "120"), Seq[Any]("x2", "200")),
      s"restarted ASOF view: $got")
  }

  test("#220e session view restart: a bridging row MERGES two pre-restart sessions (full-state stage-2 reload)") {
    def minUs(m: Int): Long = m * 60000000L
    val sql = "SELECT session_window(ev, '10 minutes') AS sw, count(*) AS n, sum(v) AS total " +
      "FROM f GROUP BY session_window(ev, '10 minutes')"
    val (src, ck, out) = (tmp("rssesssrc"), tmp("rssessck"), tmp("rssessout"))
    def ins(k: Long, evMin: Int, v: Int, seq: Long) =
      Change("insert", k, ts(seq.toInt), Map("ev" -> minUs(evMin).toString, "v" -> v.toString), seq)
    val half1 = Seq(ins(1L, 0, 1, 1L), ins(2L, 5, 2, 2L), ins(3L, 20, 4, 3L), ins(4L, 25, 8, 4L))
    val half2 = Seq(ins(5L, 12, 16, 5L)) // bridges [0,15) and [20,35) into [0,35)
    writeChanges(src, "f1.json", half1)
    deploy(sql, Map("f" -> src), ck, out)
    writeChanges(src, "f2.json", half2)
    deploy(sql, Map("f" -> src), ck, out)
    val got = spark.read.parquet(out).collect().toSeq
      .groupBy(_.getAs[Long]("sw_start_us"))
      .view.mapValues(_.maxBy(_.getAs[Long]("batch_id")))
      .collect { case (s, r) if r.getAs[Long]("_live_rows") > 0L =>
        s -> (r.getAs[Long]("sw_end_us"), r.getAs[Long]("n"), r.getAs[Double]("total")) }
      .toMap
    // one merged session — counting all four PRE-restart rows, which only
    // the checkpointed per-group contribution state could supply
    assert(got == Map(minUs(0) -> ((minUs(35), 5L, 31.0))), s"restarted session view: $got")
    // and the pre-restart sessions tombstoned on merge (post-restart batches)
    val tombs = spark.read.parquet(out).filter(col("_live_rows") === 0L)
      .select("sw_start_us").as[Long].collect().toSet
    assert(tombs == Set(minUs(20)), s"merged-away session must tombstone: $tombs")
  }

  test("#220g approx view restart: HLL registers survive the checkpoint — the estimate counts BOTH halves' distincts") {
    val sql = "SELECT cat, count(*) AS n, approx_count_distinct(uid) AS au FROM t GROUP BY cat"
    val (src, ck, out) = (tmp("rsapxsrc"), tmp("rsapxck"), tmp("rsapxout"))
    val rnd = new scala.util.Random(7)
    val uids = Seq.fill(1500)(rnd.nextLong()).distinct
    require(uids.length >= 1400)
    // half 1 carries the first 1000 uids, half 2 the last 1000 — the
    // middle 500-ish only exist in checkpointed registers at the merge
    val half1 = uids.take(1000).zipWithIndex.map { case (u, i) =>
      Change("insert", 10000L + i, ts(0), Map("cat" -> "a", "uid" -> u.toString), i + 1L) }
    val half2 = uids.takeRight(1000).zipWithIndex.map { case (u, i) =>
      Change("insert", 20000L + i, ts(1), Map("cat" -> "a", "uid" -> u.toString), 5000L + i) }
    writeChanges(src, "f1.json", half1)
    deploy(sql, Map("t" -> src), ck, out)
    writeChanges(src, "f2.json", half2)
    deploy(sql, Map("t" -> src), ck, out)
    val last = spark.read.parquet(out).orderBy(col("batch_id").desc).head()
    assert(last.getAs[Long]("n") == 2000L, s"count must span both deployments: $last")
    val est   = last.getAs[Long]("au").toDouble
    val exact = uids.length.toDouble
    assert(math.abs(est - exact) / exact < 0.05,
      s"estimate $est must cover BOTH halves' ${exact.toInt} distincts (registers reloaded, not reset)")
  }

  test("#220h restart continuity holds on the RocksDB state-store provider (the 100TB-cardinality config)") {
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sql = "SELECT city, count(*) AS n, max(amount) AS hi FROM t GROUP BY city"
      val (src, ck, out) = (tmp("rsrdbsrc"), tmp("rsrdbck"), tmp("rsrdbout"))
      val half1 = Seq(
        Change("insert", 1L, ts(0), Map("city" -> "ber", "amount" -> "50"), 1L),
        Change("insert", 2L, ts(1), Map("city" -> "ber", "amount" -> "30"), 2L))
      val half2 = Seq(Change("delete", 1L, ts(10), Map.empty, 3L)) // max falls back to 30
      writeChanges(src, "f1.json", half1)
      deploy(sql, Map("t" -> src), ck, out)
      writeChanges(src, "f2.json", half2)
      deploy(sql, Map("t" -> src), ck, out)
      val got = aggFinal(out, Seq("city"), Seq("n", "hi"))
      assert(got == Map(Seq[Any]("ber") -> Seq[Any](1L, 30.0)),
        s"RocksDB-backed restart must fall back to the checkpointed next-best: $got")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("#220i DISTINCT-aggregate view restart: the two-level composition's per-value state survives the checkpoint") {
    val sql = "SELECT city, count(DISTINCT dev) AS nd FROM t GROUP BY city"
    val (src, ck, out) = (tmp("rsdistsrc"), tmp("rsdistck"), tmp("rsdistout"))
    val half1 = Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "dev" -> "ph"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "ber", "dev" -> "ph"), 2L), // second holder of ph
      Change("insert", 3L, ts(2), Map("city" -> "ber", "dev" -> "pc"), 3L))
    // after the redeploy: deleting ONE ph holder must NOT drop the
    // count (the other holder is known only to checkpointed per-value
    // state); deleting pc (last holder) must
    val half2 = Seq(
      Change("delete", 1L, ts(10), Map.empty, 4L),
      Change("delete", 3L, ts(11), Map.empty, 5L))
    writeChanges(src, "f1.json", half1)
    deploy(sql, Map("t" -> src), ck, out)
    writeChanges(src, "f2.json", half2)
    deploy(sql, Map("t" -> src), ck, out)
    val got = aggFinal(out, Seq("city"), Seq("nd"))
    assert(got == Map(Seq[Any]("ber") -> Seq[Any](1L)),
      s"ph must survive its first holder's death via checkpointed per-value counts: $got")
  }

  test("#220j mixed-OVER view restart: both spec dataflows and the merge fold resume coherently") {
    val sql = "SELECT name, row_number() OVER (PARTITION BY city ORDER BY score DESC) AS rn, " +
      "sum(score) OVER (PARTITION BY team ORDER BY score DESC) AS ts FROM t"
    val (src, ck, out) = (tmp("rsmixsrc"), tmp("rsmixck"), tmp("rsmixout"))
    def ins(k: Long, city: String, team: String, name: String, score: Int, seq: Long) =
      Change("insert", k, ts(seq.toInt),
        Map("city" -> city, "team" -> team, "name" -> name, "score" -> score.toString), seq)
    val half1 = Seq(
      ins(1L, "ber", "red", "a", 50, 1L), ins(2L, "ber", "red", "b", 40, 2L),
      ins(3L, "par", "red", "c", 30, 3L))
    val half2 = Seq(Change("delete", 1L, ts(10), Map.empty, 4L)) // re-ranks ber AND re-sums red
    writeChanges(src, "f1.json", half1)
    deploy(sql, Map("t" -> src), ck, out)
    writeChanges(src, "f2.json", half2)
    deploy(sql, Map("t" -> src), ck, out)
    val fin = rowFinal(out, Seq("name", "rn", "ts"))
    // survivors: b (ber/red, 40) and c (par/red, 30). b promotes to
    // rn=1 in ber (spec-1 partition state reloaded); team-red DESC
    // running sums re-derive over {40, 30}: b=40, c=70 (spec-2 state
    // reloaded). Both legs flow through the resumed merge fold.
    assert(fin == Map(
      2L -> Seq[Any]("b", 1L, "40.0"),
      3L -> Seq[Any]("c", 1L, "70.0")),
      s"mixed view after restart: $fin")
  }

  test("#220k materializeExpiring restart: tombstone positions AND expiry timers survive the checkpoint") {
    val sql = "SELECT name FROM t WHERE amount > 5"
    val (src, ck, out) = (tmp("rsexpsrc"), tmp("rsexpck"), tmp("rsexpout"))
    def deployExpiring(): Unit = {
      val feeds = Map("t" -> ChangeFeed.readJsonDir(spark, src).as[Change])
      val pv = IncrementalPlanner.materializeExpiring(spark, sql, feeds,
        watermarkDelay = "1 second", tombstoneTtlMs = 1000L)
      val q = IncrementalView.withRelaxedWatermarkCheck(spark) {
        pv.df.writeStream
          .foreachBatch { (df: DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id)).write.mode("append").parquet(out)
          }
          .outputMode(pv.outputMode)
          .option("checkpointLocation", ck)
          .start()
      }
      try q.processAllAvailable() finally q.stop()
    }
    // run 1: a lives; b enters then deletes (tombstone armed with a
    // 1 s TTL against the watermark)
    writeChanges(src, "f1.json", Seq(
      Change("insert", 1L, ts(0), Map("name" -> "a", "amount" -> "10"), 1L),
      Change("insert", 2L, ts(1), Map("name" -> "b", "amount" -> "9"), 2L),
      Change("delete", 2L, ts(2), Map.empty, 3L)))
    deployExpiring()
    // run 2a: a STALE straggler for b (older than its delete) must
    // still drop — the tombstone's position survived the restart
    writeChanges(src, "f2.json", Seq(
      Change("update", 2L, ts(1), Map("name" -> "b-stale", "amount" -> "9"), 1L)))
    deployExpiring()
    val afterStale = rowFinal(out, Seq("name"))
    assert(afterStale == Map(1L -> Seq[Any]("a")),
      s"stale straggler must lose to the checkpointed tombstone: $afterStale")
    // the tombstone is IN the checkpointed store before expiry (#187's
    // offline reader — the operational "what does the view hold" view)
    def liveStateKeys(): Set[Long] =
      StateInspect.store(spark, ck).select("key.value").collect().map(_.getLong(0)).toSet
    assert(liveStateKeys() == Set(1L, 2L), s"pre-expiry state: ${liveStateKeys()}")
    // run 2b: late traffic advances the watermark far past death+ttl —
    // the timer ARMED IN RUN 1 fires in a later deployment (timeout
    // state checkpointed with the store), removing b's tombstone while
    // live rows stay
    writeChanges(src, "f3.json", Seq(
      Change("insert", 3L, ts(60), Map("name" -> "c", "amount" -> "8"), 4L),
      Change("insert", 4L, ts(120), Map("name" -> "d", "amount" -> "7"), 5L)))
    deployExpiring()
    assert(liveStateKeys() == Set(1L, 3L, 4L),
      s"b's tombstone must expire via the run-1-armed timer; live rows must stay: ${liveStateKeys()}")
    // the view CONTENTS never changed from the expiry (retractions were
    // emitted at death — expiry changes state size, not results)
    val fin = rowFinal(out, Seq("name"))
    assert(fin == Map(1L -> Seq[Any]("a"), 3L -> Seq[Any]("c"), 4L -> Seq[Any]("d")),
      s"post-expiry view: $fin")
  }

  test("#220f materializeTopK restart: leader deletion promotes from full-group state; the emission counter continues") {
    val sql = "SELECT city, sum(amount) AS total FROM t GROUP BY city ORDER BY total DESC LIMIT 2"
    val (src, ck, out) = (tmp("rstopksrc"), tmp("rstopkck"), tmp("rstopkout"))
    val half1 = Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "amount" -> "50"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "par", "amount" -> "40"), 2L),
      Change("insert", 3L, ts(2), Map("city" -> "rom", "amount" -> "30"), 3L), // below the cut
      Change("insert", 4L, ts(3), Map("city" -> "lis", "amount" -> "20"), 4L))
    val half2 = Seq(Change("delete", 1L, ts(10), Map.empty, 5L)) // ber dies: rom must promote
    writeChanges(src, "f1.json", half1)
    deploy(sql, Map("t" -> src), ck, out,
      (s, f) => IncrementalPlanner.materializeTopK(spark, s, f))
    val emitsRun1 = spark.read.parquet(out).agg(max("_emit")).as[Long].head()
    writeChanges(src, "f2.json", half2)
    deploy(sql, Map("t" -> src), ck, out,
      (s, f) => IncrementalPlanner.materializeTopK(spark, s, f))
    val log = spark.read.parquet(out)
    val maxEmit = log.agg(max("_emit")).as[Long].head()
    // the consumer contract (take the max-_emit rows) only survives a
    // redeploy if the counter CONTINUES from checkpointed state
    assert(maxEmit > emitsRun1, s"emission counter reset across restart: run1=$emitsRun1 max=$maxEmit")
    val fin = log.filter(col("_emit") === maxEmit).orderBy("rank").collect().toSeq
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("city"), r.getAs[String]("total")))
    assert(fin == Seq((1L, "par", "40.0"), (2L, "rom", "30.0")),
      s"promotion must surface the checkpointed below-cut group: $fin")
  }
}
