package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** SURVEY.md §2.3 #234 — the NAMED materialized-view catalog: create,
  * query-by-name, layer-by-name, drop, and whole-graph restart from
  * checkpoints (the #220 contract lifted to the managed graph). The
  * capstone (#234e) wires a live Debezium topic into a named view — the
  * #222h production shape behind the engine's front door.
  */
class ViewCatalogSpec extends SparkSpec {
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

  private def snapRows(cat: ViewCatalog, view: String, cols: Seq[String]): Set[Seq[String]] =
    cat.snapshot(view).collect().toSet.map((r: org.apache.spark.sql.Row) =>
      cols.map(c => r.getAs[String](c)))

  test("#234a create + query by name: snapshot tracks inserts, group moves, deletes") {
    val (root, src) = (tmp("vcroot"), tmp("vcsrc"))
    val cat = new ViewCatalog(spark, root)
    cat.registerSource("t", () => ChangeFeed.readJsonDir(spark, src).as[Change])
    val v = cat.createView("city_totals",
      "SELECT city, count(*) AS n, sum(amount) AS total FROM t GROUP BY city")
    assert(v.cols == Seq("city", "n", "total"), s"view columns: ${v.cols}")
    writeChanges(src, "b1.json", Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "amount" -> "10"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "ber", "amount" -> "5"), 2L),
      Change("insert", 3L, ts(2), Map("city" -> "par", "amount" -> "7"), 3L)))
    cat.awaitAll()
    assert(snapRows(cat, "city_totals", v.cols) == Set(
      Seq("ber", "2", "15.0"), Seq("par", "1", "7.0")), "after b1")
    // a group MOVE (2: ber→par), a delete (3), and a brand-new group
    writeChanges(src, "b2.json", Seq(
      Change("update", 2L, ts(10), Map("city" -> "par", "amount" -> "5"), 4L),
      Change("delete", 3L, ts(11), Map.empty, 5L),
      Change("insert", 4L, ts(12), Map("city" -> "rom", "amount" -> "3"), 6L)))
    cat.awaitAll()
    assert(snapRows(cat, "city_totals", v.cols) == Set(
      Seq("ber", "1", "10.0"), Seq("par", "1", "5.0"), Seq("rom", "1", "3.0")),
      "after the move/delete batch")
    cat.stopAll()
  }

  test("#234b two-layer named chain: aggregate over a named row view; retraction crosses both layers") {
    val (root, src) = (tmp("vclayer"), tmp("vclsrc"))
    val cat = new ViewCatalog(spark, root)
    cat.registerSource("t", () => ChangeFeed.readJsonDir(spark, src).as[Change])
    cat.createView("big_sales", "SELECT city, amount FROM t WHERE amount > 10")
    val v2 = cat.createView("big_by_city",
      "SELECT city, count(*) AS n FROM big_sales GROUP BY city")
    writeChanges(src, "b1.json", Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "amount" -> "50"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "ber", "amount" -> "5"), 2L), // filtered out
      Change("insert", 3L, ts(2), Map("city" -> "par", "amount" -> "20"), 3L)))
    cat.awaitAll()
    assert(snapRows(cat, "big_by_city", v2.cols) == Set(Seq("ber", "1"), Seq("par", "1")),
      "layered agg after b1")
    // key 1 leaves the WHERE predicate (50→8): the row view retracts,
    // the downstream agg's ber group tombstones — both layers by name
    writeChanges(src, "b2.json", Seq(
      Change("update", 1L, ts(10), Map("city" -> "ber", "amount" -> "8"), 4L)))
    cat.awaitAll()
    assert(snapRows(cat, "big_by_city", v2.cols) == Set(Seq("par", "1")),
      "retraction must cross the named layer")
    cat.stopAll()
  }

  test("#234c DDL discipline: duplicates, unknown refs, dependent drops, full teardown") {
    val (root, src) = (tmp("vcddl"), tmp("vcdsrc"))
    val cat = new ViewCatalog(spark, root)
    cat.registerSource("t", () => ChangeFeed.readJsonDir(spark, src).as[Change])
    cat.createView("v1", "SELECT city, amount FROM t WHERE amount > 0")
    // duplicate name rejects (against views AND sources)
    val eDup = intercept[IllegalArgumentException] {
      cat.createView("v1", "SELECT city, amount FROM t WHERE amount > 1")
    }
    assert(eDup.getMessage.contains("already exists"), eDup.getMessage)
    intercept[IllegalArgumentException] { cat.createView("t", "SELECT city, amount FROM t") }
    // unknown reference rejects, naming the table
    val eRef = intercept[IllegalArgumentException] {
      cat.createView("v2", "SELECT city, count(*) AS n FROM nope GROUP BY city")
    }
    assert(eRef.getMessage.contains("unknown table nope"), eRef.getMessage)
    // ranked views reject as NAMED feeds (change identity is (key, partition))
    val eRank = intercept[Exception] {
      cat.createView("vr", "SELECT city, row_number() OVER (ORDER BY amount) AS rn FROM t")
    }
    assert(eRank.getMessage.contains("(key, partition)"), eRank.getMessage)
    // dependent blocks the drop; dropping in order frees the name + disk
    cat.createView("v2", "SELECT city, count(*) AS n FROM v1 GROUP BY city")
    val eDep = intercept[IllegalArgumentException] { cat.dropView("v1") }
    assert(eDep.getMessage.contains("dependents"), eDep.getMessage)
    cat.dropView("v2")
    cat.dropView("v1")
    assert(cat.viewNames.isEmpty, s"views remain: ${cat.viewNames}")
    assert(!Files.exists(Paths.get(root, "views", "v1")), "v1's dirs must be deleted")
    assert(!Files.exists(Paths.get(root, "meta", "v1.properties")), "v1's meta must be deleted")
    // the freed name is re-creatable
    cat.createView("v1", "SELECT city, amount FROM t WHERE amount > 100")
    cat.dropView("v1")
  }

  test("#234d whole-graph restart from checkpoints: resume() continues the tail without recount (#220 lifted)") {
    val (root, src) = (tmp("vcrestart"), tmp("vcrsrc"))
    // session 1: two-layer graph, first batch
    val cat1 = new ViewCatalog(spark, root)
    cat1.registerSource("t", () => ChangeFeed.readJsonDir(spark, src).as[Change])
    cat1.createView("rows_v", "SELECT city, amount FROM t WHERE amount > 10")
    cat1.createView("agg_v", "SELECT city, count(*) AS n, sum(amount) AS total FROM rows_v GROUP BY city")
    writeChanges(src, "b1.json", Seq(
      Change("insert", 1L, ts(0), Map("city" -> "ber", "amount" -> "50"), 1L),
      Change("insert", 2L, ts(1), Map("city" -> "par", "amount" -> "20"), 2L)))
    cat1.awaitAll()
    cat1.stopAll()
    // session 2: a FRESH catalog over the same root resumes the graph
    val cat2 = new ViewCatalog(spark, root)
    cat2.registerSource("t", () => ChangeFeed.readJsonDir(spark, src).as[Change])
    val resumed = cat2.resume()
    assert(resumed == Seq("rows_v", "agg_v"), s"resume order: $resumed")
    // the tail lands post-restart: an update moving a key's amount, a
    // delete retracting a PRE-RESTART contribution, and a new key
    writeChanges(src, "b2.json", Seq(
      Change("update", 1L, ts(10), Map("city" -> "ber", "amount" -> "30"), 3L),
      Change("delete", 2L, ts(11), Map.empty, 4L),
      Change("insert", 3L, ts(12), Map("city" -> "par", "amount" -> "40"), 5L)))
    cat2.awaitAll()
    val cols = cat2.view("agg_v").get.cols
    // checkpointed state, not a recount: ber keeps ONE row (LWW update,
    // no double-count), par's pre-restart row retracts
    assert(snapRows(cat2, "agg_v", cols) == Set(
      Seq("ber", "1", "30.0"), Seq("par", "1", "40.0")),
      s"restarted graph state: ${snapRows(cat2, "agg_v", cols)}")
    cat2.stopAll()
  }

  test("#234e CAPSTONE: a live Debezium topic behind a named view (the #222h shape, by name)") {
    implicit val sqlCtx = spark.sqlContext
    def pgEnvelope(op: String, before: String, after: String, tsMs: Long, lsn: Long): String =
      s"""{"payload":{"before":$before,"after":$after,""" +
        s""""source":{"connector":"postgresql","ts_ms":$tsMs,"lsn":$lsn},"op":"$op","ts_ms":${tsMs + 250}}}"""
    val topic = MemoryStream[(String, String)]
    val cat = new ViewCatalog(spark, tmp("vcdbz"))
    cat.registerSource("customers",
      () => ChangeFeed.fromDebezium(topic.toDF().toDF("key", "value"), "id").as[Change])
    val v = cat.createView("customers_by_city",
      "SELECT city, count(*) AS n FROM customers GROUP BY city")
    topic.addData(
      ("k", pgEnvelope("c", "null", """{"id":1,"name":"ann","city":"ber"}""", 1700000000000L, 100L)),
      ("k", pgEnvelope("c", "null", """{"id":2,"name":"bob","city":"ber"}""", 1700000010000L, 101L)),
      ("k", pgEnvelope("c", "null", """{"id":3,"name":"cat","city":"par"}""", 1700000020000L, 102L)))
    cat.awaitAll()
    assert(snapRows(cat, "customers_by_city", v.cols) == Set(Seq("ber", "2"), Seq("par", "1")),
      "debezium-backed named view after creates")
    // an update moves customer 2 ber→par; a delete removes 3
    topic.addData(
      ("k", pgEnvelope("u", """{"id":2,"name":"bob","city":"ber"}""",
        """{"id":2,"name":"bob","city":"par"}""", 1700000030000L, 103L)),
      ("k", pgEnvelope("d", """{"id":3,"name":"cat","city":"par"}""", "null", 1700000040000L, 104L)))
    cat.awaitAll()
    assert(snapRows(cat, "customers_by_city", v.cols) == Set(Seq("ber", "1"), Seq("par", "1")),
      "debezium-backed named view after update+delete")
    cat.stopAll()
  }
}
