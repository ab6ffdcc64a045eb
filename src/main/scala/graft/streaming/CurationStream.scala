package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

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

  // ------------------------------------------------------------------
  // #237: the STREAMING NEAR-DUP tier — d07's full verdict ladder
  // (exact_dup > near_dup > novel) judged live per micro-batch against
  // the standing corpus index, not just the exact-hash guard above.
  // ------------------------------------------------------------------

  /** Publish the standing corpus's dedup index under `indexDir`:
    * `hashes/` (d01's content-hash index) and `postings/` (the 5-shingle
    * postings) — the two artifacts [[dedupVerdicts]] probes. Republish as
    * the corpus grows; running verdict streams pick the new index up at
    * their NEXT micro-batch without restart (the #124
    * resolve-inside-foreachBatch pattern).
    *
    * Publication is VERSIONED, never in-place: each publish lands a
    * complete index under `indexDir/v=<n>/` and only then flips the
    * `CURRENT` pointer file. An in-place overwrite would delete parquet
    * files out from under a verdict stream's in-flight batch scan
    * (FileNotFoundException mid-task); with versioning an in-flight batch
    * finishes against the version it resolved, and the next batch
    * resolves the new one. Superseded versions are retained until
    * [[pruneDedupIndex]] — GC is an explicit maintenance step so no
    * reader horizon has to be guessed here. Returns the published
    * version's directory.
    */
  def publishDedupIndex(corpus: DataFrame, indexDir: String): String = {
    val fs = fsOf(corpus.sparkSession, indexDir)
    val base = new HPath(indexDir)
    val next = listVersions(fs, base).sorted.lastOption.getOrElse(0L) + 1L
    val vdir = new HPath(base, s"v=$next")
    graft.operators.Dedup.corpusHashIndex(corpus)
      .write.mode(SaveMode.Overwrite).parquet(new HPath(vdir, "hashes").toString)
    graft.operators.Dedup.corpusPostings(corpus)
      .write.mode(SaveMode.Overwrite).parquet(new HPath(vdir, "postings").toString)
    // pointer flip: write the manifest to a temp name, then rename over
    // CURRENT. Rename is atomic on HDFS/posix; readers that race the
    // (object-store) non-atomic window fall back to the highest v= dir —
    // which is exactly the version being published, already complete.
    val tmp = new HPath(base, "_CURRENT.tmp")
    val cur = new HPath(base, "CURRENT")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(cur)) fs.delete(cur, false)
    fs.rename(tmp, cur): Unit
    vdir.toString
  }

  /** Drop superseded index versions, keeping the newest `keep` (≥1 —
    * CURRENT is never deleted). Run as maintenance once every verdict
    * stream has taken a batch past the publish that superseded them.
    */
  def pruneDedupIndex(spark: SparkSession, indexDir: String, keep: Int = 2): Unit = {
    require(keep >= 1, "keep must be >= 1")
    val fs = fsOf(spark, indexDir)
    val base = new HPath(indexDir)
    listVersions(fs, base).sorted.dropRight(keep)
      .foreach(v => fs.delete(new HPath(base, s"v=$v"), true): Unit)
  }

  /** Resolve the index directory a batch should read: `CURRENT` if the
    * pointer exists, else the highest published `v=` dir (the pointer-
    * flip race window), else `indexDir` itself (pre-versioning flat
    * layout — keeps old published indexes readable).
    */
  def resolveIndexDir(spark: SparkSession, indexDir: String): String = {
    val fs = fsOf(spark, indexDir)
    val base = new HPath(indexDir)
    val cur = new HPath(base, "CURRENT")
    val fromPointer =
      if (!fs.exists(cur)) None
      else {
        val in = fs.open(cur)
        val n = try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](256)
          Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
            .foreach(k => buf.write(chunk, 0, k))
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        } finally in.close()
        Some(n)
      }
    fromPointer.orElse(listVersions(fs, base).sorted.lastOption)
      .map(n => new HPath(base, s"v=$n").toString)
      .getOrElse(indexDir)
  }

  private type HPath = org.apache.hadoop.fs.Path

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)

  /** One micro-batch's verdicts + dead letters. Poison documents (NULL
    * doc_id or NULL/empty text — rows the shingler and hasher would
    * judge garbage on) are split out, never judged: one bad crawl record
    * must not kill the query (the #31c discipline). Returns
    * `(verdicts, poison)`.
    */
  def verdictBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
      threshold: Double = 0.5): (DataFrame, DataFrame) = {
    val poisonCond = col("doc_id").isNull || col("text").isNull || trim(col("text")) === ""
    val poison  = batch.filter(poisonCond)
      .select(col("doc_id"), col("text"),
        when(col("doc_id").isNull, "null_doc_id").otherwise("empty_text").as("reason"))
    val good    = batch.filter(!coalesce(poisonCond, lit(true)))
    val vdir    = resolveIndexDir(spark, indexDir)
    val hashes  = spark.read.parquet(s"$vdir/hashes")
    val posts   = spark.read.parquet(s"$vdir/postings")
    (graft.operators.Dedup.verdictsAgainstIndex(good, hashes, posts, threshold), poison)
  }

  /** The live d07: judge every arriving document against the standing
    * corpus index, batch-parity by construction — each micro-batch runs
    * the SAME [[graft.operators.Dedup.verdictsAgainstIndex]] core the
    * batch operator runs, against the index as published at that
    * moment. Verdicts land in `outDir` partitioned by batch id (the
    * [[FeedSink.writeBatch]] idempotent-replay discipline), dead letters
    * append to `dlqDir`.
    *
    * Scale shape: per batch, cost ∝ batch size — the corpus postings
    * prune to the batch's grams via semi-join before any wide join (an
    * index LOOKUP at 100 TB, provided the postings are bucketed/sorted
    * by gram on publish), and the index re-resolve per batch is a
    * metadata read, not a scan.
    */
  def dedupVerdictsStream(spark: SparkSession, docs: DataFrame, indexDir: String,
      outDir: String, dlqDir: String,
      threshold: Double = 0.5): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processVerdictBatch(spark, batch, batchId, indexDir, outDir, dlqDir, threshold)
      }

  /** The foreachBatch body, factored so replay idempotency is directly
    * spec-testable: verdicts AND dead letters both land batch-partitioned
    * under dynamic partition overwrite — a crash-replayed micro-batch
    * (foreachBatch re-invoked with the same batchId) overwrites its own
    * batch_id partition in BOTH sinks instead of appending duplicates.
    * An empty poison set touches no partitions, so clean batches cost one
    * no-op job on the DLQ side.
    */
  def processVerdictBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      indexDir: String, outDir: String, dlqDir: String,
      threshold: Double = 0.5): Unit = {
    val (verdicts, poison) = verdictBatch(spark, batch, indexDir, threshold)
    verdicts
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)
    poison.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dlqDir)
  }
}
