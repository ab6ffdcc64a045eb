package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Crash-injection flag for #174f — an object field is shared across
  * "executors" under local mode (one JVM), which is exactly the seam the
  * spec needs: arm, run the real parallel egress, one task dies.
  */
object JdbcCrashFlag { @volatile var armed = false }

/** SURVEY.md §2.3 #174 — exactly-once JDBC egress: replay idempotence
  * (same batch applied twice → bit-identical table) and atomicity of a
  * crash between the row writes and the commit (rollback reverts both
  * the rows and the marker).
  */
class JdbcSinkSpec extends SparkSpec {

  private def ts(minutes: Int): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  private def freshUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target").toAbsolutePath, "derby_sink")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def stateDf(rows: (Long, Map[String, String], Boolean)*) = {
    import spark.implicits._
    rows.map { case (k, p, d) => KeyState(k, 1000L + k, k, p, d) }.toDF()
  }

  test("#174a streaming changefeed egresses to Derby; deletes remove rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val url   = freshUrl()
    val table = "view_a"
    JdbcSink.ensureTables(url, table)
    val input = MemoryStream[Change]
    val q = CdcMaterializer.materialize(input.toDS())
      .toDF()
      .writeStream
      .foreachBatch(JdbcSink.egress(url, table) _)
      .outputMode(OutputMode.Update())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("jdbc_ck").toString)
      .start()
    try {
      input.addData(
        Change("insert", 1L, ts(0), Map("v" -> "a"), 1L),
        Change("insert", 2L, ts(1), Map("v" -> "x", "w" -> "y"), 2L))
      q.processAllAvailable()
      input.addData(
        Change("update", 1L, ts(10), Map("v" -> "b"), 3L),
        Change("delete", 2L, ts(11), Map.empty, 4L))
      q.processAllAvailable()
      val got = JdbcSink.readTable(url, table)
      assert(got.map(r => (r._1, r._2)) == Seq((1L, "v=b")),
        s"table must hold the view's final live state: $got")
    } finally q.stop()
  }

  test("#174b replay idempotence: the same batch applied twice leaves the table identical") {
    val url   = freshUrl()
    val table = "view_b"
    JdbcSink.ensureTables(url, table)
    val df = stateDf(
      (1L, Map("v" -> "a"), false),
      (2L, Map("v" -> "b", "u" -> "c"), false),
      (3L, Map.empty[String, String], true))
    JdbcSink.egress(url, table)(df, batchId = 7L)
    val once = JdbcSink.readTable(url, table)
    assert(once.map(_._1) == Seq(1L, 2L), "tombstone key 3 must not materialize")
    // crash-after-commit replay: foreachBatch re-runs the whole batch
    JdbcSink.egress(url, table)(df, batchId = 7L)
    assert(JdbcSink.readTable(url, table) == once, "replayed batch must be a no-op")
    // and a LATER batch still applies (markers are per batch, not global)
    JdbcSink.egress(url, table)(stateDf((1L, Map("v" -> "z"), false)), batchId = 8L)
    assert(JdbcSink.readTable(url, table).find(_._1 == 1L).get._2 == "v=z")
  }

  test("#174c crash between row writes and commit: transaction reverts rows AND marker") {
    val url   = freshUrl()
    val table = "view_c"
    JdbcSink.ensureTables(url, table)
    val good = stateDf((1L, Map("v" -> "a"), false), (2L, Map("v" -> "b"), false))
    // first deployment crashes after applying rows, before commit
    val boom = intercept[Exception] {
      JdbcSink.egress(url, table,
        beforeCommit = () => throw new RuntimeException("crash before commit"))(good, batchId = 0L)
    }
    assert(boom.getMessage != null)
    assert(JdbcSink.readTable(url, table).isEmpty,
      "rollback must revert the partial rows — no torn batch visible")
    // the marker rolled back too: the recovered run re-applies cleanly
    JdbcSink.egress(url, table)(good, batchId = 0L)
    assert(JdbcSink.readTable(url, table).map(_._1) == Seq(1L, 2L),
      "recovery must apply the batch exactly once")
  }

  test("#174d parallel egress: per-partition markers give partial-failure recovery") {
    // Derby's embedded lock manager can't host CONCURRENT writers, so
    // the parallel protocol is spec'd at its seam: each partition of a
    // parallelism>1 egress runs applyPartition with its own partition
    // id — here injected directly, as two tasks of the same batch.
    val url   = freshUrl()
    val table = "view_d"
    JdbcSink.ensureTables(url, table)
    // schema-ful rows (applyPartition reads fields by name)
    def rowsOf(ks: Long*): Seq[org.apache.spark.sql.Row] =
      stateDf(ks.map(k => (k, Map("v" -> s"p$k"), false)): _*).collect().toSeq
    // partition 0 commits; partition 1 crashes before its commit
    JdbcSink.applyPartition(url, table, batchId = 0L, partitionId = 0, rowsOf(1L, 2L).iterator)
    intercept[Exception] {
      JdbcSink.applyPartition(url, table, batchId = 0L, partitionId = 1, rowsOf(3L, 4L).iterator,
        beforeCommit = () => throw new RuntimeException("crash partition 1"))
    }
    assert(JdbcSink.readTable(url, table).map(_._1) == Seq(1L, 2L),
      "partition 1's rows must have rolled back with its marker")
    // the batch replays WHOLE (foreachBatch semantics): partition 0
    // skips via its marker, partition 1 applies — exactly once overall
    JdbcSink.applyPartition(url, table, batchId = 0L, partitionId = 0, rowsOf(1L, 2L).iterator)
    JdbcSink.applyPartition(url, table, batchId = 0L, partitionId = 1, rowsOf(3L, 4L).iterator)
    assert(JdbcSink.readTable(url, table).map(_._1) == Seq(1L, 2L, 3L, 4L))
    // and a second full replay is a global no-op
    JdbcSink.applyPartition(url, table, batchId = 0L, partitionId = 0, rowsOf(1L, 2L).iterator)
    JdbcSink.applyPartition(url, table, batchId = 0L, partitionId = 1, rowsOf(3L, 4L).iterator)
    assert(JdbcSink.readTable(url, table).map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("#174f REAL egress(parallelism=4) crash/replay: one partition dies mid-batch, the resumed replay converges bit-identical") {
    val url   = freshUrl()
    val table = "view_f"
    JdbcSink.ensureTables(url, table)
    val df = stateDf((1L to 40L).map(k => (k, Map("v" -> s"p$k"), false)): _*)
    // the victim partition id under parallelism-4 key-hash routing for
    // SOME key in 1..40 — every partition is populated, pick 2
    JdbcCrashFlag.armed = true
    val crashingEgress = JdbcSink.egress(url, table, parallelism = 4,
      beforeCommit = () => {
        if (JdbcCrashFlag.armed && org.apache.spark.TaskContext.getPartitionId() == 2)
          throw new RuntimeException("crash partition 2 before its commit")
      }) _
    val boom = intercept[Exception] { crashingEgress(df, 0L) }
    assert(boom != null)
    val partial = JdbcSink.readTable(url, table)
    // partition 2's keys are all absent (its transaction rolled back);
    // whatever other partitions committed before the job died are fine
    import org.apache.spark.sql.functions._
    val p2Keys = df.select(col("key")).repartition(4, col("key"))
      .withColumn("pid", spark_partition_id())
      .collect().collect { case r if r.getAs[Int]("pid") == 2 => r.getAs[Long]("key") }.toSet
    assert(p2Keys.nonEmpty, "sanity: partition 2 must own some keys")
    assert(partial.map(_._1).toSet.intersect(p2Keys).isEmpty,
      s"crashed partition's rows must not be visible: ${partial.map(_._1)}")
    // the resumed deployment replays the SAME batch whole: committed
    // partitions skip via markers, the crashed one applies
    JdbcCrashFlag.armed = false
    crashingEgress(df, 0L)
    val full = JdbcSink.readTable(url, table)
    assert(full.map(_._1) == (1L to 40L) && full.forall(r => r._2 == s"v=p${r._1}"),
      s"resumed table must hold all 40 rows: ${full.map(_._1)}")
    // and one more full replay is a global no-op — bit-identical
    crashingEgress(df, 0L)
    assert(JdbcSink.readTable(url, table) == full, "second replay must change nothing")
  }

  test("#174e unbounded payloads round-trip (CLOB column); hostile table names are rejected") {
    val url   = freshUrl()
    val table = "view_e"
    JdbcSink.ensureTables(url, table)
    val big = Map("blob" -> ("x" * 100000)) // far past any VARCHAR(4096)
    JdbcSink.egress(url, table)(stateDf((1L, big, false)), batchId = 0L)
    val got = JdbcSink.readTable(url, table)
    assert(got.head._2 == s"blob=${"x" * 100000}", "oversized payload must not poison the batch")
    intercept[IllegalArgumentException] {
      JdbcSink.ensureTables(url, "t; DROP TABLE view_e --")
    }
    intercept[IllegalArgumentException] {
      JdbcSink.egress(url, "bad name")(stateDf((1L, Map.empty[String, String], true)), 1L)
    }
  }
}
