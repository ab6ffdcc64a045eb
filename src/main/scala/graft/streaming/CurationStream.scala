package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming training-data curation (SURVEY.md §2.3 #82): the batch
  * cleaning pipeline (normalize → quality-gate → exact-dedup) applied to a
  * live document feed — the shape a crawl ingest pipeline runs 24/7, where
  * each arriving document must be judged NOW against what already passed.
  *
  * Dedup state is bounded by the watermark: `dropDuplicatesWithinWatermark`
  * keeps a content-hash only until the event-time watermark passes it, so
  * the state store holds the recent-horizon hash set, not the full corpus
  * history (the full-corpus pass is the batch family d01/d06 — this is the
  * near-line guard in front of it).
  */
object CurationStream {

  /** Normalize + filter + dedup a streaming `(doc_id, ts, text)` feed.
    * Survivors carry the cleaned text and its content hash; whitespace-
    * and case-variant copies of an already-seen document are dropped.
    */
  def cleanDocs(
      docs: DataFrame,
      watermarkDelay: String = "10 minutes",
      minTokens: Int = 5): DataFrame = {
    val clean = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    docs
      .withColumn("clean", clean)
      .withColumn("n_tokens", size(split(col("clean"), " ")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("content_hash", md5(col("clean")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .select("doc_id", "ts", "content_hash", "n_tokens", "clean")
  }

  /** [[cleanDocs]] plus decontamination against the STANDING corpus: a
    * stream-static LEFT ANTI join drops any arriving doc whose content
    * hash the batch dedup pipeline already admitted (d01's hash index is
    * exactly the static side). The static side is RE-EXECUTED each
    * micro-batch but its plan is frozen at query start — to pick up a
    * REPUBLISHED index without restart, drive this join inside
    * foreachBatch with the index view resolved per batch, the
    * [[VersionedFeed.enrichStream]] (#124) mechanism. Within-stream
    * recurrence is
    * still handled by the watermark-bounded dedup — the anti join guards
    * against the corpus, the dedup against the feed itself.
    */
  def cleanDocsAgainstCorpus(
      docs: DataFrame,
      corpusHashes: DataFrame,
      watermarkDelay: String = "10 minutes",
      minTokens: Int = 5): DataFrame =
    cleanDocs(docs, watermarkDelay, minTokens)
      .join(corpusHashes.select(col("content_hash")), Seq("content_hash"), "left_anti")
}
