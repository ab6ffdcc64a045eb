package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-SKIPPING index over a plain parquet directory — the data-skipping
  * tier that completes #281's z-order layout (SURVEY.md §2.5 #286).
  * Spark's parquet reader prunes ROW GROUPS from pushed filters, but on a
  * stock directory every FILE is still opened (listed, scheduled, footer
  * read) before its row groups can be skipped — at 100 TB that is
  * millions of task-side footer reads for a point query. Table formats
  * fix this with per-file column stats in the manifest; this is that
  * manifest for a plain directory: one `_graft_index/envelopes` table of
  * per-file min/max per indexed column, consulted DRIVER-side to shrink
  * the file list before the scan is even planned.
  *
  * Build is ONE distributed scan (`input_file_name` group-by — the same
  * pass [[ZOrderLayout.envelopes]] measures with); reads prune with the
  * standard interval rule (a file can hold `c BETWEEN lo AND hi` only if
  * `c_min <= hi AND c_max >= lo`; NULL-only stats never prune). The
  * index is advisory metadata: a stale index (files added after build)
  * fails CLOSED by unioning unindexed files into every read, so results
  * are correct — just less pruned — until the next build or [[update]].
  *
  * The underscore-prefixed index dir is invisible to plain
  * `spark.read.parquet(dir)` readers — adopting or dropping the index
  * never changes what a non-indexed reader sees.
  */
object SkippingIndex {

  private def indexPath(root: String) = new Path(root, "_graft_index/envelopes")

  // scheme renderings differ between input_file_name (file:///x) and
  // FileSystem listings (file:/x) — compare by scheme-less path
  private def norm(s: String) = new Path(s).toUri.getPath

  private def envelopes(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).head,
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).tail: _*)

  /** Build (or rebuild) the envelope manifest for `cols`: one scan of
    * the directory, one tiny parquet table of per-file stats.
    */
  def build(spark: SparkSession, root: String, cols: Seq[String]): Unit =
    envelopes(spark.read.parquet(root), cols)
      .coalesce(1).write.mode("overwrite").parquet(indexPath(root).toString)

  /** Incremental maintenance (#293 — the streaming-append story): scan
    * ONLY the files that arrived since the last build/update and append
    * their envelopes to the manifest — cost ∝ the new batch, never the
    * table, which is what keeps a continuously-ingesting 100 TB
    * directory's manifest fresh (a full [[build]] re-scan per batch
    * would dominate the ingest itself). Indexed columns come from the
    * existing manifest's schema, so an update can never fork the column
    * set. Crash discipline matches the fail-closed read: the manifest
    * append lands atomically per file, and any file whose envelope
    * never landed simply stays in the unioned-unindexed set — correct,
    * just unpruned. Returns the number of newly indexed files (0 = the
    * manifest was already current). No manifest yet → full [[build]].
    */
  def update(spark: SparkSession, root: String, cols: Seq[String]): Long = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(indexPath(root))) {
      build(spark, root, cols)
      return dataFiles(fs, new Path(root)).size.toLong
    }
    val idx = spark.read.parquet(indexPath(root).toString)
    val expected = cols.flatMap(c => Seq(s"${c}_min", s"${c}_max")).toSet + "file"
    require(idx.columns.toSet == expected,
      s"index at $root covers ${idx.columns.mkString(",")}, not ${cols.mkString(",")} — " +
        "rebuild with build() to change the indexed column set")
    val indexed = idx.select("file").collect().map(r => norm(r.getString(0))).toSet
    val all     = dataFiles(fs, new Path(root))
    val live    = all.map(norm).toSet
    val fresh   = all.filterNot(p => indexed(norm(p)))
    val dead    = indexed.diff(live)
    if (dead.nonEmpty) {
      // compaction/retention removed indexed files: rewrite the manifest
      // without their entries (then append the fresh ones below). The
      // read path already ignores dead entries, so this is hygiene, not
      // correctness — it keeps the manifest from growing monotonically.
      val keptRows = idx.filter(!udfFree(col("file"), dead)).collect()
      val kept = spark.createDataFrame(
        spark.sparkContext.parallelize(keptRows.toIndexedSeq, 1), idx.schema)
      kept.coalesce(1).write.mode("overwrite").parquet(indexPath(root).toString)
    }
    if (fresh.nonEmpty)
      envelopes(spark.read.parquet(fresh: _*), cols)
        .coalesce(1).write.mode("append").parquet(indexPath(root).toString)
    fresh.size.toLong
  }

  /** Membership test as a Column without a UDF: the dead set is tiny
    * (files a maintenance pass just deleted), so an isin over the
    * normalized rendering is the plan-friendly form.
    */
  private def udfFree(fileCol: Column, dead: Set[String]): Column = {
    // manifest entries render as input_file_name did (file:///…); match
    // on either rendering of each dead path
    val variants = dead.flatMap(p => Seq(p, s"file://$p", s"file:$p"))
    fileCol.isin(variants.toSeq: _*)
  }

  /** Read `root` with `c BETWEEN lo AND hi` (inclusive), consulting the
    * index to hand Spark ONLY the files whose envelope intersects the
    * range — the scan never lists, schedules, or opens the rest. Files
    * newer than the index (unindexed) are failed CLOSED into the read.
    * The residual filter still applies: pruning is a superset cut, the
    * predicate is the truth.
    */
  def readRange(spark: SparkSession, root: String, c: String, lo: Column, hi: Column): DataFrame = {
    val idx = spark.read.parquet(indexPath(root).toString)
    val keep = idx
      .filter(col(s"${c}_min").isNull || (col(s"${c}_min") <= hi && col(s"${c}_max") >= lo))
      .select("file").collect().map(_.getString(0))
    val indexed = idx.select("file").collect().map(r => norm(r.getString(0))).toSet
    val fs  = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = dataFiles(fs, new Path(root))
    // BOTH staleness directions against the live listing: files added
    // after the build fail CLOSED into the read, and manifest entries
    // whose file is GONE (compaction/retention deleted it — its rows now
    // live in files the manifest calls unindexed) drop out, instead of
    // handing the scan a dead path
    val live      = all.map(norm).toSet
    val unindexed = all.filterNot(p => indexed(norm(p)))
    val paths = (keep.filter(p => live(norm(p))) ++ unindexed).toSeq
    val df =
      if (paths.isEmpty) spark.read.parquet(root).limit(0) // nothing can match; keep the schema
      else spark.read.parquet(paths: _*)
    df.filter(col(c) >= lo && col(c) <= hi)
  }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[String] = {
    val entries = fs.listStatus(dir).toSeq
      .filterNot(st => st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
    entries.filter(st => st.isFile && st.getPath.getName.endsWith(".parquet")).map(_.getPath.toString) ++
      entries.filter(_.isDirectory).flatMap(d => dataFiles(fs, d.getPath))
  }
}
