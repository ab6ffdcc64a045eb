package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2.3 #221 — planner-view BOOTSTRAP from a batch snapshot:
  * `CREATE MATERIALIZED VIEW over an existing table + changefeed`
  * without replaying the feed's full history. The snapshot renders as
  * its compacted changefeed ([[ChangeFeed.snapshotChanges]]) and lands
  * as the feed directory's prefix ([[ChangeFeed.writeBootstrap]]); the
  * view converges over O(current keys), then follows the live tail.
  * Mirror of spec #32f (CdcMaterializer.materializeFrom) on the
  * planner's multi-stage surface: convergence equals full-history
  * replay, and stale-drop holds against the bootstrapped positions.
  */
class PlannerBootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  private def tmp(prefix: String): String = {
    val root = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(root)
    Files.createTempDirectory(root, prefix).toString
  }

  private def writeChanges(dir: String, name: String, cs: Seq[Change]): Unit = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val lines = cs.map { c =>
      val iso = java.time.Instant.ofEpochSecond(0, CdcMaterializer.micros(c.ts) * 1000L).toString
      val payload = c.payload.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
      s"""{"op":"${c.op}","key":${c.key},"ts":"$iso","payload":{$payload},"seq":${c.seq}}"""
    }
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))
  }

  private def deploy(sql: String, feedDirs: Map[String, String], outDir: String): Unit = {
    val feeds = feedDirs.map { case (n, d) => n -> ChangeFeed.readJsonDir(spark, d).as[Change] }
    val pv = IncrementalPlanner.materialize(spark, sql, feeds)
    val q = pv.df.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id)).write.mode("append").parquet(outDir)
      }
      .outputMode(pv.outputMode)
      .option("checkpointLocation", tmp("bootck"))
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def aggFinal(outDir: String, groupCols: Seq[String], valCols: Seq[String]): Map[Seq[Any], Seq[Any]] =
    spark.read.parquet(outDir).collect().toSeq
      .groupBy(r => groupCols.map(c => r.getAs[Any](c)))
      .view.mapValues(_.maxBy(_.getAs[Long]("batch_id")))
      .collect { case (g, r) if r.getAs[Long]("_live_rows") > 0L => g -> valCols.map(c => r.getAs[Any](c)) }
      .toMap

  private def rowFinal(outDir: String, cols: Seq[String]): Map[Long, Seq[Any]] =
    spark.read.parquet(outDir).collect().toSeq
      .sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("seq")))
      .foldLeft(Map.empty[Long, Seq[Any]]) { (m, r) =>
        if (r.getAs[String]("op") == "delete") m - r.getAs[Long]("key")
        else m + (r.getAs[Long]("key") -> cols.map(c => r.getAs[Any](c)))
      }

  // the feed's HISTORY: churn that the bootstrapped deployment never sees
  private val history = Seq(
    Change("insert", 1L, ts(0), Map("city" -> "ber", "amount" -> "2"), 1L),
    Change("update", 1L, ts(4), Map("city" -> "ber", "amount" -> "10"), 2L),
    Change("insert", 2L, ts(1), Map("city" -> "par", "amount" -> "99"), 3L),
    Change("update", 2L, ts(5), Map("city" -> "ber", "amount" -> "50"), 4L),
    Change("insert", 3L, ts(2), Map("city" -> "par", "amount" -> "30"), 5L),
    Change("insert", 4L, ts(3), Map("city" -> "par", "amount" -> "7"), 6L),
    Change("delete", 4L, ts(6), Map.empty, 7L))

  // live tail applied after the snapshot: a genuine update, a STALE
  // change older than its key's snapshot position (must drop), a delete
  // retracting a snapshot-only contribution, and a brand-new key
  private val tail = Seq(
    Change("update", 3L, ts(20), Map("city" -> "par", "amount" -> "35"), 8L),
    Change("update", 2L, ts(3), Map("city" -> "xxx", "amount" -> "999"), 1L), // stale vs snapshot (ts 5, seq 4)
    Change("delete", 1L, ts(21), Map.empty, 9L),
    Change("insert", 5L, ts(22), Map("city" -> "par", "amount" -> "4"), 10L))

  /** The snapshot table: history's final LWW state WITH commit positions
    * (the shape any graft materialization — q21, FeedSink.stateAsOf —
    * already persists).
    */
  private def snapshotDf: DataFrame =
    history.groupBy(_.key).toSeq
      .map { case (k, cs) => (k, cs.sortBy(c => (CdcMaterializer.micros(c.ts), c.seq)).last) }
      .collect { case (k, c) if c.op != "delete" =>
        (k, c.ts, c.seq, c.payload("city"), c.payload("amount")) }
      .toDF("key", "ts", "seq", "city", "amount")

  test("#221a snapshot-bootstrapped aggregate view == full-history replay; stale-drop holds vs bootstrapped positions") {
    val sql = "SELECT city, count(*) AS n, sum(amount) AS total, max(amount) AS hi FROM t GROUP BY city"
    // deployment A: the full history then the tail (the expensive path)
    val (srcA, outA) = (tmp("bootAsrc"), tmp("bootAout"))
    writeChanges(srcA, "f1.json", history)
    writeChanges(srcA, "f2.json", tail)
    deploy(sql, Map("t" -> srcA), outA)
    // deployment B: bootstrap prefix + the same tail — never sees history
    val (srcB, outB) = (tmp("bootBsrc"), tmp("bootBout"))
    ChangeFeed.writeBootstrap(snapshotDf, "key", "ts", Some("seq"), srcB)
    writeChanges(srcB, "f2.json", tail)
    deploy(sql, Map("t" -> srcB), outB)
    val (a, b) = (aggFinal(outA, Seq("city"), Seq("n", "total", "hi")),
      aggFinal(outB, Seq("city"), Seq("n", "total", "hi")))
    assert(b == a, s"bootstrapped view\n  $b\n  != full-replay view\n  $a")
    // the stale tail change did NOT apply (key 2 stayed in ber at 50):
    // proof the bootstrap carried the snapshot's commit positions
    assert(!b.contains(Seq[Any]("xxx")), s"stale change beat the bootstrapped position: $b")
    assert(b(Seq[Any]("ber")) == Seq[Any](1L, 50.0, 50.0), s"ber after delete of key 1: $b")
    assert(b(Seq[Any]("par")) == Seq[Any](2L, 39.0, 35.0), s"par: $b")
  }

  test("#221b snapshot-bootstrapped JOIN view: a live partner pairs with bootstrapped arrangement state") {
    val sql = "SELECT l.name AS name, r.tag AS tag FROM t1 l JOIN t2 r ON l.city = r.city"
    val snapL = Seq((1L, ts(0), 1L, "ber", "a"), (2L, ts(1), 2L, "par", "b"))
      .toDF("key", "ts", "seq", "city", "name")
    val (srcL, srcR, out) = (tmp("bootjl"), tmp("bootjr"), tmp("bootjout"))
    ChangeFeed.writeBootstrap(snapL, "key", "ts", Some("seq"), srcL)
    // right side is all-live: its rows must find the BOOTSTRAPPED left
    // rows in the arrangement (never re-sent)
    writeChanges(srcR, "live.json", Seq(
      Change("insert", 1L, ts(10), Map("city" -> "ber", "tag" -> "x"), 1L),
      Change("insert", 2L, ts(11), Map("city" -> "rom", "tag" -> "y"), 2L)))
    deploy(sql, Map("t1" -> srcL, "t2" -> srcR), out)
    val got = rowFinal(out, Seq("name", "tag")).values.toSeq.sortBy(_.mkString("|"))
    assert(got == Seq(Seq[Any]("a", "x")), s"bootstrapped join: $got")
  }

  test("#221d bootstrap THEN restart: a view bootstrapped from a snapshot redeploys from its checkpoint mid-tail") {
    val sql = "SELECT city, count(*) AS n, max(amount) AS hi FROM t GROUP BY city"
    val (src, out) = (tmp("bootrssrc"), tmp("bootrsout"))
    val ck = tmp("bootrsck")
    def deployCk(): Unit = {
      val feeds = Map("t" -> ChangeFeed.readJsonDir(spark, src).as[Change])
      val pv = IncrementalPlanner.materialize(spark, sql, feeds)
      val q = pv.df.writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.withColumn("batch_id", lit(id)).write.mode("append").parquet(out)
        }
        .outputMode(pv.outputMode)
        .option("checkpointLocation", ck)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    ChangeFeed.writeBootstrap(snapshotDf, "key", "ts", Some("seq"), src)
    writeChanges(src, "t1.json", tail.take(2)) // update + the stale change
    deployCk()
    writeChanges(src, "t2.json", tail.drop(2)) // delete + new key, post-restart
    deployCk()
    val got = aggFinal(out, Seq("city"), Seq("n", "hi"))
    // the delete of key 1 (a BOOTSTRAPPED contribution) retracts across
    // the restart; stale change never applied
    assert(got == Map(
      Seq[Any]("ber") -> Seq[Any](1L, 50.0),
      Seq[Any]("par") -> Seq[Any](2L, 35.0)),
      s"bootstrapped+restarted view: $got")
  }

  test("#221c snapshotChanges drops NULL columns and casts positions; payload carries every non-LSN column incl. the PK") {
    val snap = Seq((7L, ts(2), 3L, "ber", null: String)).toDF("key", "ts", "seq", "city", "note")
    val c = ChangeFeed.snapshotChanges(snap, "key", "ts", Some("seq")).as[Change].head()
    // Debezium-image parity: the key and ts columns ride the payload
    // under their own names (so GROUP BY key works on bootstrapped rows),
    // the NULL note is omitted, the LSN column stays out
    assert(c.op == "insert" && c.key == 7L && c.ts == ts(2) && c.seq == 3L, s"rendered: $c")
    assert(c.payload("city") == "ber" && c.payload("key") == "7", s"payload: ${c.payload}")
    assert(c.payload.contains("ts") && !c.payload.contains("note") && !c.payload.contains("seq"),
      s"payload: ${c.payload}")
  }

  test("#221e string-PK snapshot keys via xxhash64, identically to the Debezium adapters") {
    // a uuid/natural-key snapshot must fold with a live string-PK CDC
    // tail: same xxhash64(seed 42) rule as ChangeFeed.fromDebezium
    val snap = Seq(("u-42", ts(2), 3L, "ber")).toDF("uid", "ts", "seq", "city")
    val c = ChangeFeed.snapshotChanges(snap, "uid", "ts", Some("seq")).as[Change].head()
    val expectHash = spark.range(1).select(xxhash64(lit("u-42"))).head().getLong(0)
    assert(c.key == expectHash, s"snapshot key ${c.key} != xxhash64 $expectHash")
    assert(c.payload("uid") == "u-42", "the natural key survives in the payload")
    // numeric-STRING keys keep their value (no hashing), matching dbzParsed
    val snapNum = Seq(("12345", ts(2), 1L, "par")).toDF("uid", "ts", "seq", "city")
    val cn = ChangeFeed.snapshotChanges(snapNum, "uid", "ts", Some("seq")).as[Change].head()
    assert(cn.key == 12345L, s"numeric-string key: ${cn.key}")
  }

  test("#221f JDBC snapshot source: DB-table bootstrap + CDC tail == full-history replay (the day-1 deployment story)") {
    val sql = "SELECT city, count(*) AS n, sum(amount) AS total, max(amount) AS hi FROM t GROUP BY city"
    // deployment A: the full change history then the tail
    val (srcA, outA) = (tmp("bootjdbcA"), tmp("bootjdbcAout"))
    writeChanges(srcA, "f1.json", history)
    writeChanges(srcA, "f2.json", tail)
    deploy(sql, Map("t" -> srcA), outA)
    // the SOURCE DATABASE: history's final LWW state living in a real
    // JDBC table (embedded Derby — the in-spec stand-in for the
    // production OLTP database), commit positions as table columns
    val dbDir = tmp("bootjdbcdb")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    snapshotDf.withColumnRenamed("key", "pk")
      .write.mode("overwrite").jdbc(url, "snap", new java.util.Properties)
    // deployment B: snapshot the DB table as the feed's bootstrap
    // prefix, then hand off to the CDC topic mid-stream — B never sees
    // the history, only the database's current rows + the live tail
    val (srcB, outB) = (tmp("bootjdbcB"), tmp("bootjdbcBout"))
    ChangeFeed.writeBootstrapJdbc(spark, url, "snap", "pk", "ts", Some("seq"), srcB)
    writeChanges(srcB, "f2.json", tail)
    deploy(sql, Map("t" -> srcB), outB)
    val (a, b) = (aggFinal(outA, Seq("city"), Seq("n", "total", "hi")),
      aggFinal(outB, Seq("city"), Seq("n", "total", "hi")))
    assert(b == a, s"DB-bootstrapped view\n  $b\n  != full-replay view\n  $a")
    // stale-drop holds against the DATABASE's commit positions: the
    // tail change at (ts 3, seq 1) lost to key 2's snapshot (ts 5, seq 4)
    assert(!b.contains(Seq[Any]("xxx")), s"stale change beat the DB position: $b")
    assert(b(Seq[Any]("ber")) == Seq[Any](1L, 50.0, 50.0), s"ber: $b")
    assert(b(Seq[Any]("par")) == Seq[Any](2L, 39.0, 35.0), s"par: $b")
    // the rendered bootstrap keys are the table's numeric PKs verbatim
    // (same rule as the Debezium adapters — the tail's keys MATCH)
    val keys = ChangeFeed.snapshotChangesJdbc(spark, url, "snap", "pk", "ts", Some("seq"))
      .select("key").as[Long].collect().toSet
    assert(keys == Set(1L, 2L, 3L), s"bootstrap keys: $keys")
  }
}
