package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.{dot, l2Norm}
import graft.operators.Similarity

/** Incrementally maintained ANN index over the changefeed (SURVEY.md
  * §2.3 #337) — the changefeed × LLM-pipeline intersection: keep the s02
  * hyperplane-LSH bucket index LIVE under insert / update / delete, so a
  * `similarTo` probe sees every document change without ever rebuilding
  * the batch index.
  *
  * Store layout (both halves plain partitioned parquet, the
  * PartitionedUpsert table discipline):
  *
  *   - `root/data/bucket=<b>/` — the LSH POSTING LISTS: one row per live
  *     vector `(vec_id, embedding, norm)`, partitioned by its hyperplane
  *     bucket. This is the index a probe reads — partition pruning turns
  *     "probe 9 buckets" into "open 9 directories".
  *   - `root/keys/kb=<kb>/` — the PRIMARY locator
  *     `(vec_id, tsUs, seq, live, bucket)`, partitioned by
  *     `kb = vec_id mod keyBuckets`. A delete/update arrives with only a
  *     key; this sidecar answers "which bucket holds its current
  *     posting" by opening the batch's key partitions, never scanning
  *     the data store. It also carries the CdcMaterializer commit
  *     position `(tsUs, seq)` and delete TOMBSTONES (`live = false`), so
  *     out-of-order changes resolve exactly as the materializer does: a
  *     change strictly older than the key's stored position is ignored —
  *     including a late re-insert of a deleted key.
  *
  * Maintenance cost per micro-batch ∝ batch size × touched partitions —
  * new/changed vectors re-bucket only themselves (the hyperplane
  * signature is a narrow per-row expression), deletes retract exactly
  * their posting row, and only the touched bucket/key partitions are
  * read back (`IN`-filter partition pruning) and rewritten (dynamic
  * partition overwrite; a partition whose last posting was retracted is
  * cleared explicitly — the PartitionedUpsert delete-all-bucket rule).
  * The corpus-sized store is never re-shuffled: at 100 TB with 2²⁰
  * buckets, a 1M-doc crawl batch rewrites ~its own buckets, and an
  * UPDATE whose embedding moves buckets costs one retraction + one
  * insertion, found via the locator without any scan. Tombstones are
  * sidecar-only (a few longs per deleted key);
  * [[pruneTombstones]] is the compaction sweep that drops those older
  * than the feed's maximum admissible lateness.
  *
  * Batching-invariance + idempotent replay come from the CdcMaterializer
  * discipline: the batch folds to last-writer-wins per key by commit
  * position BEFORE touching the store, the store copy then contends at
  * its own position (batch wins ties, so replays rewrite identical
  * content), and replace-then-rewrite is a deterministic function of
  * (store, batch winners). The spec proves live index ≡ one-shot batch
  * rebuild after a mixed I/U/D feed, under uneven batch splits, replays,
  * and late stale changes.
  *
  * `numPlanes` is an index-CREATION parameter (like PartitionedUpsert's
  * bucket count): re-sizing the plane count re-buckets every vector and
  * therefore means a rebuild, exactly as for the batch index
  * ([[Similarity.autoPlanes]] picks it from expected corpus size).
  */
object AnnIndexView {

  private def dataDir(root: String) = s"$root/data"
  private def keysDir(root: String) = s"$root/keys"

  private val dataSchema = StructType(Seq(
    StructField("bucket", IntegerType), StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)), StructField("norm", DoubleType)))
  private val keysSchema = StructType(Seq(
    StructField("kb", IntegerType), StructField("vec_id", LongType),
    StructField("tsUs", LongType), StructField("seq", LongType),
    StructField("live", BooleanType), StructField("bucket", IntegerType)))

  private def readOr(spark: SparkSession, path: String, schema: StructType): DataFrame =
    try spark.read.parquet(path).select(schema.fieldNames.map(col).toSeq: _*)
    catch { case _: AnalysisException =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema) }

  /** Clear partition directories that were touched but ended the batch
    * with zero surviving rows — dynamic overwrite only rewrites
    * partitions PRESENT in the output, so an emptied partition would
    * otherwise resurrect its retracted rows on the next read.
    */
  private def clearEmptied(spark: SparkSession, root: String, colName: String,
      touched: Seq[Long], survivors: Set[Long]): Unit =
    IndexStoreOps.clearEmptiedLeaves(spark, root, colName,
      touched.map(_.toString), survivors.map(_.toString))

  /** Fold one micro-batch of changes (`op` ∈ I/U/D, `vec_id`,
    * `embedding`, `tsUs`, `seq`) into the live index at `root`.
    */
  def updateBatch(batch: DataFrame, root: String, numPlanes: Int = 8, keyBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    // LWW winner per key: a batch may carry a key's whole history (and
    // redeliveries); only its latest change contends with the store.
    // Ties on (tsUs, seq) are redeliveries of the same change — op desc
    // makes even a pathological same-position I/D pair deterministic.
    val wLww = Window.partitionBy("vec_id")
      .orderBy(col("tsUs").desc, col("seq").desc, col("op").desc)
    val winners = batch
      .select(col("op"), col("vec_id"), col("embedding"), col("tsUs"), col("seq"))
      .withColumn("__rn", row_number().over(wLww)).filter(col("__rn") === 1).drop("__rn")
      .withColumn("kb", pmod(col("vec_id"), lit(keyBuckets.toLong)).cast("int"))
      .persist()
    // every cached frame unpersists in the finally — a failed store
    // write must not leak blocks in a long-lived foreachBatch session
    val cached = scala.collection.mutable.Buffer[DataFrame](winners)
    try {
      // locator partitions the batch touches — driver-side (≤ keyBuckets)
      val kbs = winners.select("kb").distinct().collect().map(_.getInt(0).toLong).sorted.toSeq
      val keysOld = readOr(spark, keysDir(root), keysSchema)
        .filter(col("kb").isin(kbs: _*))
      // stored position + current bucket of every batch key
      val loc = keysOld.join(winners.select("vec_id"), Seq("vec_id"), "left_semi")
        .select(col("vec_id"), col("tsUs").as("s_ts"), col("seq").as("s_seq"),
          col("live"), col("bucket").as("old_bucket"))
      // stale detection, CdcMaterializer order: drop a batch winner
      // strictly older than the store's position (late change after a
      // newer upsert OR after a delete tombstone); batch wins ties so a
      // replayed change rewrites its own identical content.
      val eff = winners.join(loc, Seq("vec_id"), "left")
        .filter(col("s_ts").isNull || col("tsUs") > col("s_ts") ||
          (col("tsUs") === col("s_ts") && col("seq") >= col("s_seq")))
        .persist()
      cached += eff
      val ups = Similarity.withHyperplaneBucket(eff.filter(col("op") =!= "D"), numPlanes)
        .withColumn("norm", l2Norm(col("embedding")))
        .select(col("bucket").cast("int").as("bucket"), col("vec_id"), col("embedding"),
          col("norm"), col("kb"), col("tsUs"), col("seq"))
        .persist()
      cached += ups
      val effKeys = eff.select("vec_id")

      // touched DATA partitions = current buckets of effective LIVE keys
      // (retractions/moves) ∪ new buckets of upserts — bounded by
      // 2 × batch keys, the small side
      val touched = eff.filter(col("live") === true).select(col("old_bucket").as("bucket"))
        .union(ups.select("bucket"))
        .distinct().collect().map(_.getInt(0).toLong).sorted.toSeq
      IndexStoreOps.inParallel(
        if (touched.nonEmpty) {
          val dataOld = readOr(spark, dataDir(root), dataSchema)
            .filter(col("bucket").isin(touched: _*))
          IndexStoreOps.overwriteLeaves(// staged: store is both source and sink of this job
            dataOld
            .join(effKeys, Seq("vec_id"), "left_anti") // retract old copies of effective keys
            .unionByName(ups.select(col("bucket"), col("vec_id"), col("embedding"), col("norm"))),
            "bucket", dataDir(root), touched.map(_.toString)): Unit
        },
        if (kbs.nonEmpty) {
          val keysNew = eff.select(col("kb"), col("vec_id"), col("tsUs"), col("seq"), col("op"))
            .join(ups.select(col("vec_id"), col("bucket")), Seq("vec_id"), "left")
            .select(col("kb"), col("vec_id"), col("tsUs"), col("seq"),
              (col("op") =!= "D").as("live"), col("bucket"))
          IndexStoreOps.overwriteLeaves(keysOld
            .join(effKeys, Seq("vec_id"), "left_anti")
            .unionByName(keysNew), "kb", keysDir(root), kbs.map(_.toString)): Unit
        })
    } finally cached.foreach(_.unpersist())
  }

  /** Compaction sweep: drop delete tombstones older than the feed's
    * maximum admissible lateness (a change older than a pruned tombstone
    * can no longer be rejected by it — the standard tombstone-GC
    * contract). Sidecar-only rewrite; the posting store is untouched.
    */
  def pruneTombstones(spark: SparkSession, root: String, olderThanUs: Long): Unit = {
    val kept = IndexStoreOps.clusterByLeaf(readOr(spark, keysDir(root), keysSchema)
      .filter(col("live") || col("tsUs") >= olderThanUs), "kb")
    kept.write.mode(SaveMode.Overwrite).partitionBy("kb").parquet(keysDir(root))
  }

  /** Small-file compaction over the churned store (r15) — see
    * [[PostingIndexView.compactStore]]; same OPTIMIZE pass, same
    * rows-unchanged contract.
    */
  def compactStore(spark: SparkSession, root: String,
      targetBytes: Long = 64L << 20, smallBytes: Long = 16L << 20): Seq[graft.sources.Compaction.LeafReport] =
    graft.sources.Compaction.compact(spark, dataDir(root), targetBytes, smallBytes) ++
      graft.sources.Compaction.compact(spark, keysDir(root), targetBytes, smallBytes)

  /** `FORGET KEY` over THIS store (#338 extended to the live-index tier,
    * r15): erase every at-rest trace of `key` — its posting row (if
    * live) AND its locator row INCLUDING a delete tombstone (the
    * tombstone itself names the key, so GDPR erasure must take it too).
    * The locator answers WHERE the posting lives, so the data-store
    * rewrite is partition-pruned to exactly the key's bucket; only the
    * key's kb locator partition is rewritten. Erasing the tombstone
    * forfeits its late-replay protection for this key — the same trade
    * [[pruneTombstones]] makes, acceptable because the purge contract
    * (as in [[ViewCatalog.forgetKey]]) is that the SOURCE has stopped
    * feeding the key. Returns (partitions_rewritten, rows_dropped).
    */
  def forgetKey(spark: SparkSession, root: String, key: Long): (Long, Long) =
    forgetKeys(spark, root, Seq(key))

  /** Batch `FORGET KEYS` (#367, r16 — the compliance-pipeline shape):
    * ONE IN-pruned rewrite per touched store partition for the WHOLE
    * purge list. A daily list of 10k keys through per-key [[forgetKey]]
    * re-reads and rewrites hot partitions up to 10k times; here cost is
    * ∝ distinct touched partitions, never ∝ keys × partitions.
    */
  def forgetKeys(spark: SparkSession, root: String, keys: Seq[Long]): (Long, Long) = {
    val keySet = keys.distinct
    if (keySet.isEmpty) return (0L, 0L)
    val locRows = readOr(spark, keysDir(root), keysSchema)
      .filter(col("vec_id").isin(keySet: _*)).collect()
    if (locRows.isEmpty) return (0L, 0L)
    var parts = 0L
    var dropped = 0L
    val liveBuckets = locRows.filter(_.getAs[Boolean]("live"))
      .map(_.getAs[Int]("bucket").toLong).distinct.toSeq
    if (liveBuckets.nonEmpty) {
      val dataOld = readOr(spark, dataDir(root), dataSchema)
        .filter(col("bucket").isin(liveBuckets: _*))
      val kept = IndexStoreOps.clusterByLeaf(
        dataOld.filter(!col("vec_id").isin(keySet: _*)), "bucket")
      dropped += dataOld.count() - kept.count()
      kept.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(dataDir(root))
      clearEmptied(spark, dataDir(root), "bucket", liveBuckets,
        kept.select("bucket").distinct().collect().map(_.getInt(0).toLong).toSet)
      parts += liveBuckets.size
    }
    val kbs = locRows.map(_.getAs[Int]("kb").toLong).distinct.toSeq
    val keysOld = readOr(spark, keysDir(root), keysSchema).filter(col("kb").isin(kbs: _*))
    val keysKept = IndexStoreOps.clusterByLeaf(
      keysOld.filter(!col("vec_id").isin(keySet: _*)), "kb")
    dropped += locRows.length
    keysKept.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("kb")
      .parquet(keysDir(root))
    clearEmptied(spark, keysDir(root), "kb", kbs,
      keysKept.select("kb").distinct().collect().map(_.getInt(0).toLong).toSet)
    parts += kbs.size
    (parts, dropped)
  }

  /** The [[forgetKey]] auditor for this store: at-rest rows still
    * naming `key` — posting rows plus locator rows (tombstones count:
    * they carry the key id). Zero = forgotten.
    */
  def keyTraces(spark: SparkSession, root: String, key: Long): Long =
    keyTraces(spark, root, Seq(key))

  /** Batch auditor (#367's companion): traces for the WHOLE list in one
    * scan per store side, not |list| scans.
    */
  def keyTraces(spark: SparkSession, root: String, keys: Seq[Long]): Long =
    readOr(spark, dataDir(root), dataSchema).filter(col("vec_id").isin(keys: _*)).count() +
      readOr(spark, keysDir(root), keysSchema).filter(col("vec_id").isin(keys: _*)).count()

  /** #337 wired end-to-end: changefeed → live LSH index. */
  def maintain(feed: DataFrame, root: String, checkpointDir: String,
      numPlanes: Int = 8, keyBuckets: Int = 64): DataStreamWriter[Row] =
    feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        updateBatch(batch, root, numPlanes, keyBuckets) }

  /** The live postings `(bucket, vec_id, embedding, norm)` — for the
    * spec's live ≡ batch-rebuild equality.
    */
  def readIndex(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(dataDir(root))
      .select(col("bucket").cast("int").as("bucket"), col("vec_id"), col("embedding"), col("norm"))

  /** Probe the LIVE index: top-k cosine neighbors of each query row
    * `(query_id, embedding)` — the s02 multi-probe dataflow served from
    * the maintained store. The probed bucket ids are collected
    * driver-side (queries × (planes+1), tiny by assumption) so the
    * postings scan is PARTITION-PRUNED to the probed directories — at
    * 100 TB a probe opens ~9 bucket partitions, not the corpus.
    */
  def similarTo(spark: SparkSession, root: String, queries: DataFrame,
      k: Int = 3, numPlanes: Int = 8): DataFrame = {
    val qb = Similarity.withHyperplaneBucket(queries, numPlanes)
      .withColumn("q_norm", l2Norm(col("embedding")))
    val probes = array(col("bucket") +:
      (0 until numPlanes).map(j => col("bucket").bitwiseXOR(lit(1 << j))): _*)
    val q = qb.select(col("query_id"), col("embedding").as("q_emb"), col("q_norm"),
        explode(probes).as("bucket"))
      .withColumn("bucket", col("bucket").cast("int"))
      .persist()
    try {
      val probeBuckets = q.select("bucket").distinct().collect().map(_.getInt(0).toLong).toSeq
      val w = Window.partitionBy("query_id").orderBy(col("sim6").desc, col("neighbor_id"))
      readIndex(spark, root)
        .filter(col("bucket").isin(probeBuckets: _*))
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
          col("norm").as("n_norm"), col("bucket"))
        .join(broadcast(q), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim6", round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 6))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .select(col("query_id"), col("neighbor_id"), round(col("sim6"), 4).as("cosine"), col("rn"))
        .localCheckpoint(true) // snapshot: results must survive q.unpersist
    } finally q.unpersist()
  }

  // ---- s13: the batch-verifiable driver entry ------------------------

  /** Per-(app, corpus-snapshot) memo of the maintained index, keyed like
    * [[Similarity.annPqServed]]'s — fold the feed once per corpus, serve
    * probes from the live store afterwards.
    */
  private val liveIndexDirs =
    new scala.collection.concurrent.TrieMap[(String, String, Long), String]

  /** s13: ANN probe against the LIVE index after a mixed I/U/D feed.
    * The feed is derived deterministically from the embeddings table so
    * a SQL oracle can state the final corpus in closed form:
    *
    *   - inserts arrive in three chunks (`vec_id mod 3`), with every
    *     `vec_id mod 6 = 0` row REDELIVERED in chunk two (replay
    *     idempotence on the live path);
    *   - `vec_id mod 11 = 5` is then UPDATED to its NEGATED embedding —
    *     the negation flips every hyperplane sign, so each such vector
    *     MOVES to its complement bucket (the retract+reinsert path);
    *   - `vec_id mod 7 = 3` is DELETED;
    *   - finally every original row is REDELIVERED LATE at its insert
    *     position — entirely stale (updates keep their newer position,
    *     deleted keys are tombstoned), so the index must not move.
    *
    * Final live state ≡ `embeddings WHERE vec_id % 7 <> 3` with the
    * mod-11 negation applied — which is exactly what the DuckDB oracle
    * computes, running the s02 bucket/probe/top-k pipeline over that
    * closed form. A hash match proves the maintained store (built only
    * through incremental updateBatch folds) equals the batch rebuild.
    */
  def annLiveIndex(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val root = liveStoreFor(spark, dir)
    val queries = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10 && col("vec_id") % 7 =!= 3)
      .select(col("vec_id").as("query_id"),
        when(col("vec_id") % 11 === 5, transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
    similarTo(spark, root, queries, k, numPlanes = 8)
  }

  /** The s13 maintained store for `dir`'s embeddings corpus, built once
    * per (app, corpus snapshot) — exposed (r16) so composed queries
    * (q151 live hybrid retrieval) probe the SAME store instead of
    * folding their own copy of the feed.
    */
  def liveStoreFor(spark: SparkSession, dir: String): String =
    liveIndexDirs.getOrElseUpdate(
      (spark.sparkContext.applicationId, dir, Similarity.corpusFingerprint(spark, dir)), {
        val d = Files.createTempDirectory("graft_ann_live").toString
        val e = graft.sources.Tables.embeddings(spark, dir).select("vec_id", "embedding")
        def ins(pred: org.apache.spark.sql.Column) = e.filter(pred).select(
          lit("I").as("op"), col("vec_id"), col("embedding"),
          lit(1000L).as("tsUs"), col("vec_id").as("seq"))
        val upd = e.filter(col("vec_id") % 11 === 5).select(
          lit("U").as("op"), col("vec_id"),
          transform(col("embedding"), x => -x).as("embedding"),
          lit(2000L).as("tsUs"), col("vec_id").as("seq"))
        val del = e.filter(col("vec_id") % 7 === 3).select(
          lit("D").as("op"), col("vec_id"), col("embedding"),
          lit(3000L).as("tsUs"), col("vec_id").as("seq"))
        Seq(
          ins(col("vec_id") % 3 === 0),
          ins(col("vec_id") % 3 === 1).unionByName(ins(col("vec_id") % 6 === 0)),
          ins(col("vec_id") % 3 === 2),
          upd,
          del,
          ins(lit(true)), // late replay of every original insert: all stale
        ).foreach(b => updateBatch(b, d, numPlanes = 8, keyBuckets = 16))
        d
      })
}
