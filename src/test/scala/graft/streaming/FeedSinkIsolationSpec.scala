package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** #150: the concurrency contract of FeedSink's partition-overwrite log
  * with the r5 commit-marker protocol — the scoped alternative to
  * adopting a full open table format, spec'ing the guarantee actually
  * provided: last committer wins per batch, concurrent distinct-batch
  * writers both land, and readers see every batch atomically (marker
  * present = all rows; absent = none).
  */
class FeedSinkIsolationSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private def states(rows: (Long, Long, Long, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("key", "tsUs", "seq", "v")
      .select(col("key"), col("tsUs"), col("seq"),
        map(lit("v"), col("v")).as("payload"), lit(false).as("deleted"))
  }

  test("#150a a replayed batch fully replaces itself — last committer wins, even when it shrinks") {
    val feed = tmp("iso_a")
    FeedSink.writeBatch(states((1L, 100L, 1L, "first"), (2L, 100L, 2L, "first")), 0L, feed)
    // crash-replay of batch 0 commits DIFFERENT (fewer) rows
    FeedSink.writeBatch(states((1L, 200L, 3L, "second")), 0L, feed)
    val got = FeedSink.stateAsOf(spark, feed, 0L).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Map[String, String]]("payload")("v")).toMap
    assert(got == Map(1L -> "second"),
      s"replay must replace, not union (key 2 must be gone): $got")
  }

  test("#150b zombie writer replaying an OLD batch cannot disturb newer batches") {
    val feed = tmp("iso_b")
    FeedSink.writeBatch(states((1L, 100L, 1L, "b0")), 0L, feed)
    FeedSink.writeBatch(states((1L, 300L, 2L, "b1"), (3L, 300L, 3L, "b1")), 1L, feed)
    // zombie (the crashed first attempt's executor) finally flushes its
    // stale batch-0 content: only ITS partition changes
    FeedSink.writeBatch(states((1L, 150L, 9L, "zombie")), 0L, feed)
    val got = FeedSink.stateAsOf(spark, feed, 1L).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Map[String, String]]("payload")("v")).toMap
    assert(got == Map(1L -> "b1", 3L -> "b1"),
      s"LWW fold must keep newer-batch rows authoritative: $got")
  }

  test("#150c reader isolation: an unmarked (in-flight/torn) partition is invisible until its marker lands") {
    val feed = tmp("iso_c")
    FeedSink.writeBatch(states((1L, 100L, 1L, "committed")), 0L, feed)
    // simulate an in-flight writer: partition files fully present, marker
    // not yet written (the pre-commit window — or a crash inside it)
    states((1L, 999L, 9L, "torn"), (7L, 999L, 9L, "torn"))
      .select(lit(1L).as("batch_id"), lit("upsert").as("op"), col("key"),
        col("tsUs").as("ts_us"), col("seq"), col("payload"))
      .write.mode("append").partitionBy("batch_id").parquet(feed)
    val before = FeedSink.stateAsOf(spark, feed, 99L).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Map[String, String]]("payload")("v")).toMap
    assert(before == Map(1L -> "committed"),
      s"uncommitted batch leaked into a read: $before")
    FeedSink.commitMarker(feed, 1L) // the atomic commit point
    val after = FeedSink.stateAsOf(spark, feed, 99L).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Map[String, String]]("payload")("v")).toMap
    assert(after == Map(1L -> "torn", 7L -> "torn"),
      s"marker must make the whole batch visible at once: $after")
  }

  test("#150d concurrent writer + reader race: every observed batch is all-or-nothing") {
    val feed   = tmp("iso_d")
    val rowsPerBatch = 4
    val nBatches     = 4
    @volatile var writerErr: Option[Throwable] = None
    val writer = new Thread(() => {
      try {
        (0 until nBatches).foreach { b =>
          val rows = (0 until rowsPerBatch).map(i =>
            ((b * 100 + i).toLong, 100L + b, b.toLong, s"b$b"))
          FeedSink.writeBatch(states(rows: _*), b.toLong, feed)
        }
      } catch { case t: Throwable => writerErr = Some(t) }
    })
    writer.start()
    val observations = scala.collection.mutable.ListBuffer.empty[Map[Long, Long]]
    while (writer.isAlive) {
      // a reader polling mid-stream: per-batch row counts of what's visible
      if (FeedSink.committedBatches(feed).nonEmpty) {
        val counts = FeedSink.stateAsOf(spark, feed, 99L)
          .groupBy((col("seq")).as("b")).count().collect()
          .map(r => r.getAs[Long]("b") -> r.getAs[Long]("count")).toMap
        observations += counts
      }
    }
    writer.join()
    writerErr.foreach(throw _)
    assert(observations.nonEmpty, "the race must actually observe mid-stream reads")
    observations.foreach { counts =>
      counts.foreach { case (b, n) =>
        assert(n == rowsPerBatch.toLong,
          s"torn read: batch $b visible with $n of $rowsPerBatch rows across $observations")
      }
    }
    // final state: all batches, all rows
    assert(FeedSink.stateAsOf(spark, feed, 99L).count() == (rowsPerBatch * nBatches).toLong)
  }
}
