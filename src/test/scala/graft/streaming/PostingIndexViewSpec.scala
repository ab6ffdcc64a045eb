package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class DocChg(op: String, doc_id: Long, text: String, tsUs: Long, seq: Long)

/** #340: the live positional posting index equals the batch rebuild
  * after a mixed I/U/D document feed (re-tokenize on update, retraction
  * via the locator's token-bucket set, stale rejection via tombstoned
  * positions), and phrase probes served from the live store equal the
  * q143 batch answer over the folded final corpus.
  */
class PostingIndexViewSpec extends SparkSpec {
  private def tmp(prefix: String): String =
    Files.createTempDirectory(
      Paths.get("target/streaming-tmp").toAbsolutePath, prefix).toString

  test("#340 live posting index ≡ batch rebuild; phrase probe ≡ q143 on the folded corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = tmp("postidx")
    def chg(op: String, id: Long, text: String, ts: Long): DocChg = DocChg(op, id, text, ts, id)

    val b1 = Seq(
      chg("I", 1L, "spark stream join spark stream", 1000L),
      chg("I", 2L, "the fast key order", 1000L),
      chg("I", 3L, "spark join stream", 1000L), // non-adjacent: no phrase hit
      chg("I", 4L, "row batch window", 1000L),
      chg("I", 1L, "spark stream join spark stream", 1000L)) // in-batch dup
    val b2 = Seq(
      chg("U", 2L, "the fast key the fast key", 5000L), // re-tokenize: 2 hits now
      chg("D", 4L, "", 6000L),
      chg("I", 5L, "stream spark stream table", 7000L))
    val b3 = Seq(
      chg("U", 2L, "gone", 900L),   // stale: loses to ts=5000
      chg("I", 4L, "row batch window", 800L)) // stale re-insert of deleted doc

    val input = MemoryStream[DocChg]
    val q = PostingIndexView.maintain(input.toDF(), root, tmp("postck"), buckets = 8, keyBuckets = 4).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val finalDocs = Map(
      1L -> "spark stream join spark stream",
      2L -> "the fast key the fast key",
      3L -> "spark join stream",
      5L -> "stream spark stream table")
    // live postings equal the batch tokenization of the folded corpus
    val live = PostingIndexView.readIndex(spark, root).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val expect = finalDocs.toSeq.flatMap { case (id, t) =>
      t.split("\\s+").zipWithIndex.map { case (w, i) => (w, id, i) }.toSeq
    }.toSet
    assert(live == expect, s"postings diff: ${(live diff expect) ++ (expect diff live)}")

    // phrase probe from the live store ≡ driver-side adjacency scan
    val got = PostingIndexView.phraseSearch(spark, root,
        Seq(Seq("spark", "stream"), Seq("the", "fast", "key")), buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for {
      (id, t) <- finalDocs.toSeq
      (phrase, terms) <- Seq("spark stream" -> Seq("spark", "stream"),
        "the fast key" -> Seq("the", "fast", "key"))
      ws = t.split("\\s+").toSeq
      n = ws.indices.count(i => i + terms.length <= ws.length &&
        terms.indices.forall(j => ws(i + j) == terms(j)))
      if n > 0
    } yield (phrase, id) -> n.toLong).toMap
    assert(got == want, s"probe: $got != $want")
    assert(got(("spark stream", 1L)) == 2L && got(("the fast key", 2L)) == 2L &&
      !got.contains(("spark stream", 3L)), "adjacency and re-tokenize semantics")

    // replay b2: stale or identical — no motion
    PostingIndexView.updateBatch(b2.toDF(), root, 8, 4)
    val live2 = PostingIndexView.readIndex(spark, root).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(live2 == expect, "replaying an applied batch moved the index")
  }
}
