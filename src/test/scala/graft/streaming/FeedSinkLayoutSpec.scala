package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r17: the feed sinks cluster each micro-batch on its `batch_id`
  * partition column before the dynamic-overwrite write (the r16
  * index-store write discipline) — a batch dir gets the files its bytes
  * justify (one), not shuffle-partitions-many. This spec pins that
  * layout AND that the clustering changed nothing readable: same rows,
  * same batch isolation.
  */
class FeedSinkLayoutSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val base = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  private def states(rows: (Long, Long, Long, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // force a multi-partition batch so the one-file-per-batch layout is
    // the clustering's doing, not an accident of a single input split
    rows.toSeq.toDF("key", "tsUs", "seq", "v").repartition(8)
      .select(col("key"), col("tsUs"), col("seq"),
        map(lit("v"), col("v")).as("payload"), lit(false).as("deleted"))
  }

  private def parquetFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).toSeq.flatten.filter(_.isFile)
      .map(_.getName).filter(_.endsWith(".parquet"))
  }

  test("writeBatch lands each batch as ONE file in its batch_id dir") {
    val feed = tmp("layout_")
    FeedSink.writeBatch(states((1L, 100L, 1L, "a"), (2L, 100L, 2L, "b"),
      (3L, 100L, 3L, "c"), (4L, 100L, 4L, "d")), 0L, feed)
    FeedSink.writeBatch(states((1L, 200L, 5L, "e"), (5L, 200L, 6L, "f")), 1L, feed)
    Seq(0L, 1L).foreach { b =>
      val files = parquetFiles(s"$feed/batch_id=$b")
      assert(files.size == 1,
        s"batch_id=$b must hold exactly one parquet file, got ${files.size}: $files")
    }
    val got = spark.read.parquet(feed).collect()
      .map(r => (r.getAs[Number]("batch_id").longValue, r.getAs[Long]("key"))).toSet
    assert(got == Set((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 1L), (1L, 5L)),
      s"clustering must not change the readable rows: $got")
  }
}
