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
  * are correct — just less pruned — until the next build.
  *
  * The underscore-prefixed index dir is invisible to plain
  * `spark.read.parquet(dir)` readers — adopting or dropping the index
  * never changes what a non-indexed reader sees.
  */
object SkippingIndex {

  private def indexPath(root: String) = new Path(root, "_graft_index/envelopes")

  /** Build (or rebuild) the envelope manifest for `cols`: one scan of
    * the directory, one tiny parquet table of per-file stats.
    */
  def build(spark: SparkSession, root: String, cols: Seq[String]): Unit = {
    val stats = spark.read.parquet(root)
      .groupBy(input_file_name().as("file"))
      .agg(
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).head,
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))).tail: _*)
    stats.coalesce(1).write.mode("overwrite").parquet(indexPath(root).toString)
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
    // scheme renderings differ between input_file_name (file:///x) and
    // FileSystem listings (file:/x) — compare by scheme-less path
    def norm(s: String) = new Path(s).toUri.getPath
    val keep = idx
      .filter(col(s"${c}_min").isNull || (col(s"${c}_min") <= hi && col(s"${c}_max") >= lo))
      .select("file").collect().map(_.getString(0))
    val indexed = idx.select("file").collect().map(r => norm(r.getString(0))).toSet
    val fs  = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = dataFiles(fs, new Path(root))
    val unindexed = all.filterNot(p => indexed(norm(p)))
    val paths = (keep ++ unindexed).toSeq
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
