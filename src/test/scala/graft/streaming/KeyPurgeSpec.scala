package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec

/** SURVEY.md §2.3 #338 — `FORGET KEY k` across the derived graph: after
  * the source retracts a key, one verb erases every at-rest trace (all
  * sink batch partitions of a 3-view cascade + the SCD2 history), the
  * live state tombstone expires via ttl, and the auditor proves zero
  * traces — including after a full restart-from-checkpoint.
  */
class KeyPurgeSpec extends SparkSpec {
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
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8")): Unit
  }

  private def traceMap(cat: ViewCatalog, key: Long, hist: Seq[String]): Map[(String, String), Long] =
    cat.keyTraces(key, hist).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("#338 FORGET KEY: zero traces across cascade sinks, SCD2 history, and state; survives restart") {
    val (root, src, histDir) = (tmp("fkroot"), tmp("fksrc"), tmp("fkhist"))
    val ttl = Some(("1 second", 1000L))
    val cat = new ViewCatalog(spark, root)
    cat.registerSource("t", () => ChangeFeed.readJsonDir(spark, src).as[Change])
    cat.createView("v1", "SELECT city, amount FROM t WHERE amount > 0", ttl)
    cat.createView("v2", "SELECT city, amount FROM v1 WHERE amount > 1", ttl)
    val v3 = cat.createView("v3",
      "SELECT city, count(*) AS n, sum(amount) AS total FROM v2 GROUP BY city", ttl)
    // the SCD2 history artifact: closed versions of the raw feed, appended to parquet
    val histQ = VersionedFeed.history(ChangeFeed.readJsonDir(spark, src).as[Change])
      .writeStream.outputMode("append").format("parquet")
      .option("path", histDir).option("checkpointLocation", tmp("fkhck")).start()
    def settle(): Unit = { cat.awaitAll(); histQ.processAllAvailable() }

    writeChanges(src, "b1.json", Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "amount" -> "10"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "par", "amount" -> "20"), 2L),
      Change("insert", 3L, ts(2), Map("city" -> "rom", "amount" -> "30"), 3L)))
    settle()
    writeChanges(src, "b2.json", Seq(
      Change("update", 2L, ts(10), Map("city" -> "par", "amount" -> "25"), 4L)))
    settle()

    // purge refuses while the key is live anywhere
    val eLive = intercept[IllegalArgumentException] { cat.forgetKey(2L, Seq(histDir)) }
    assert(eLive.getMessage.contains("still live"), eLive.getMessage)
    assert(traceMap(cat, 2L, Seq(histDir)).values.sum > 0, "key 2 must have traces pre-purge")

    // source retracts key 2; two far-future batches advance the watermark
    // past delete + ttl so the state tombstone expires in every view
    writeChanges(src, "b3.json", Seq(Change("delete", 2L, ts(20), Map.empty, 5L)))
    settle()
    writeChanges(src, "b4.json", Seq(
      Change("update", 1L, ts(90), Map("city" -> "ber", "amount" -> "11"), 6L)))
    settle()
    writeChanges(src, "b5.json", Seq(
      Change("update", 3L, ts(180), Map("city" -> "rom", "amount" -> "31"), 7L)))
    settle()

    // pre-purge: history still answers for key 2 at an old batch
    val v1Batches = cat.versions("v1")
    val asOfOld = cat.snapshotAsOf("v1", v1Batches.head)
    assert(asOfOld.filter(org.apache.spark.sql.functions.col("city") === "par").count() > 0 ||
      v1Batches.length > 1, "sanity: early snapshot exists")

    val audit = cat.forgetKey(2L, Seq(histDir)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSet
    assert(audit.exists { case (a, k, n) => a == "v1" && k == "sink" && n > 0 },
      s"v1 sink rows must be dropped: $audit")
    assert(audit.exists { case (a, k, n) => a == "v2" && k == "sink" && n > 0 },
      s"v2 sink rows must be dropped: $audit")
    assert(audit.exists { case (a, k, n) => a == histDir && k == "history" && n > 0 },
      s"SCD2 versions must be dropped: $audit")

    val traces = traceMap(cat, 2L, Seq(histDir))
    assert(traces.values.forall(_ == 0L), s"all traces must be zero after FORGET KEY: $traces")
    // time travel no longer resurrects the key at ANY batch
    cat.versions("v1").foreach { b =>
      assert(cat.snapshotAsOf("v1", b)
        .filter(org.apache.spark.sql.functions.col("city") === "par").count() == 0L,
        s"snapshotAsOf($b) resurrected the purged key")
    }
    // the rest of the graph is intact
    assert(cat.snapshot("v3").collect().map(r =>
      (r.getAs[String]("city"), r.getAs[String]("n"))).toSet == Set(("ber", "1"), ("rom", "1")),
      "surviving keys must keep serving")

    // restart the whole graph from checkpoints: the purge must hold
    cat.stopAll(); histQ.stop()
    val cat2 = new ViewCatalog(spark, root)
    cat2.registerSource("t", () => ChangeFeed.readJsonDir(spark, src).as[Change])
    assert(cat2.resume().toSet == Set("v1", "v2", "v3"))
    writeChanges(src, "b6.json", Seq(
      Change("update", 3L, ts(240), Map("city" -> "rom", "amount" -> "32"), 8L)))
    cat2.awaitAll()
    val traces2 = traceMap(cat2, 2L, Seq(histDir))
    assert(traces2.values.forall(_ == 0L), s"traces must stay zero after restart: $traces2")
    assert(cat2.snapshot("v3").collect().map(r =>
      (r.getAs[String]("city"), r.getAs[String]("total"))).toSet
      .exists(_._1 == "rom"), "resumed graph keeps maintaining")
    assert(v3.cols == Seq("city", "n", "total"))
    cat2.stopAll()
  }
}
