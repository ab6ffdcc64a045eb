package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class BmChg(op: String, key: Long, value: String, tsUs: Long, seq: Long)

/** #339: the live bitmap index equals the batch word-fold rebuild after
  * a mixed I/U/D feed — under uneven micro-batch splits, value moves,
  * out-of-order stale changes (incl. a late re-insert of a deleted key,
  * rejected by its tombstone), and replays; and a single-key change
  * touches only its own value partitions.
  */
class BitmapIndexViewSpec extends SparkSpec {
  private def tmp(prefix: String): String =
    Files.createTempDirectory(
      Paths.get("target/streaming-tmp").toAbsolutePath, prefix).toString

  private def valFiles(root: String): Map[String, Set[String]] = {
    val dir = Paths.get(s"$root/bm")
    Files.list(dir).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("val="))
      .map { p =>
        p.getFileName.toString -> Files.list(p).iterator().asScala
          .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
      }.toMap
  }

  private def rebuild(m: Map[Long, String]): Set[(String, Long, Long)] =
    m.toSeq.groupBy { case (k, v) => (v, k / 63) }.map { case ((v, w), ks) =>
      (v, w, ks.map { case (k, _) => 1L << (k % 63).toInt }.reduce(_ | _))
    }.toSet

  test("#339 live bitmap index ≡ word-fold rebuild under I/U/D, out-of-order, replay; value-partition isolation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = tmp("bmidx")
    def chg(op: String, k: Long, v: String, ts: Long): BmChg = BmChg(op, k, v, ts, k)

    val b1 = (0L until 100L).map(k => chg("I", k, s"v${k % 3}", 1000L)) :+
      chg("I", 0L, "v0", 1000L) // in-batch duplicate
    val b2 = Seq(
      chg("U", 5L, "v9", 5000L),  // value move v2 → v9 (new partition)
      chg("D", 7L, "v1", 6000L),  // delete
      chg("U", 8L, "v2", 7000L))  // stays in v2 (clear+set same word)
    val b3 = Seq(
      chg("U", 5L, "v0", 900L),   // stale: must lose to ts=5000
      chg("I", 7L, "v1", 800L),   // stale re-insert of deleted key: tombstone rejects
      chg("D", 64L, "v1", 8000L)) // delete in a second word

    val input = MemoryStream[BmChg]
    val q = BitmapIndexView.maintain(input.toDF(), root, tmp("bmck"), keyBuckets = 8).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val finalMap: Map[Long, String] =
      ((0L until 100L).map(k => k -> s"v${k % 3}").toMap - 7L - 64L) +
        (5L -> "v9") + (8L -> "v2")
    def live() = BitmapIndexView.readIndex(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(live() == rebuild(finalMap), "live bitmaps must equal the word-fold rebuild")

    // replay b2 late: stale or identical — no state motion
    BitmapIndexView.updateBatch(b2.toDF(), root, 8)
    assert(live() == rebuild(finalMap), "replaying an applied batch moved the index")

    // popcount over the live index = exact counts per value
    val counts = BitmapIndexView.readIndex(spark, root)
      .groupBy("val").agg(sum(bit_count(col("bits"))).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = finalMap.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(counts == exact, s"live counts $counts != exact $exact")

    // a single-key move touches ONLY its two value partitions
    val before = valFiles(root)
    BitmapIndexView.updateBatch(Seq(chg("U", 11L, "v9", 9000L)).toDF(), root, 8)
    val after = valFiles(root)
    val touched = Set("val=v2", "val=v9") // 11 % 3 == 2 → old v2, new v9
    (before.keySet ++ after.keySet).filterNot(touched).foreach { d =>
      assert(before.get(d) == after.get(d), s"untouched partition $d was rewritten")
    }
    assert(live() == rebuild(finalMap + (11L -> "v9")),
      "index after the single-key move must equal its rebuild")
  }
}
