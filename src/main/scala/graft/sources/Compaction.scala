package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file COMPACTION — the table-maintenance lever every long-lived
  * ingest target needs (SURVEY.md §2.5 #285). Streaming sinks and
  * frequent small batch appends accrete thousands of KB-scale parquet
  * files per partition; at 100 TB that is the classic small-file
  * disease — planning time and task count scale with file count, and
  * footer/open overhead dwarfs the column bytes actually read. The
  * OPTIMIZE verb of the lakehouse formats is exactly this rewrite; this
  * is the stock-parquet form of it.
  *
  * Shape: per partition-leaf directory, every parquet file under
  * `smallBytes` is read back in ONE job and rewritten as
  * ceil(bytes/targetBytes) files via `coalesce` (a narrow, shuffle-free
  * merge of adjacent scan partitions — the rewrite moves each byte
  * once); files already ≥ `smallBytes` are left byte-identical in
  * place. Directory listing and the per-leaf job loop are driver-side
  * METADATA work (the same altitude as a planner listing files); the
  * data path is fully distributed.
  *
  * Swap discipline: new files land under a `_graft_compact_tmp` scratch
  * dir, are MOVED into the leaf (rename, atomic per file on any sane
  * FS), and only then are the consumed small files deleted — a crash
  * between move and delete leaves DUPLICATE rows visible rather than
  * losing data, and the scratch dir (underscore-prefixed, so parquet
  * readers skip it) marks the table as mid-compaction. A transactional
  * single-visibility swap needs a manifest the stock parquet layout
  * does not have — that is FeedSink's commit-marker tier (#150), which
  * published feeds get; plain-directory tables get the
  * duplicate-over-loss ordering documented here.
  */
object Compaction {

  /** One leaf directory's compaction outcome. */
  case class LeafReport(dir: String, filesBefore: Long, smallFiles: Long,
      smallBytes: Long, filesWritten: Long)

  /** Compact every partition-leaf directory under `root`: parquet files
    * smaller than `smallBytes` are rewritten into ~`targetBytes` files.
    * Returns one [[LeafReport]] per leaf touched (leaves with < 2 small
    * files are already as compact as this pass can make them and are
    * skipped). Idempotent: a second run finds nothing under the
    * threshold (unless the leaf's total small bytes were themselves
    * below `smallBytes` — the single merged file then stays put).
    */
  def compact(spark: SparkSession, root: String,
      targetBytes: Long, smallBytes: Long): Seq[LeafReport] = {
    val fs      = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = new Path(root, "_graft_compact_tmp")
    if (fs.exists(scratch)) fs.delete(scratch, true) // leftover from a crashed pass
    val reports = leafDirs(fs, new Path(root)).zipWithIndex.flatMap { case (leaf, i) =>
      val files = fs.listStatus(leaf).toSeq
        .filter(st => st.isFile && isData(st.getPath.getName))
      val small = files.filter(_.getLen < smallBytes)
      if (small.size < 2) None
      else {
        val bytes  = small.map(_.getLen).sum
        val nOut   = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        val outDir = new Path(scratch, s"leaf-$i")
        spark.read.parquet(small.map(_.getPath.toString): _*)
          .coalesce(nOut)
          .write.parquet(outDir.toString)
        // move new files in first, THEN delete the consumed ones: a crash
        // in between duplicates rows instead of dropping them
        val moved = fs.listStatus(outDir).toSeq
          .filter(st => st.isFile && isData(st.getPath.getName))
          .zipWithIndex.map { case (st, j) =>
            val dst = new Path(leaf, s"compacted-$i-$j-${st.getPath.getName}")
            require(fs.rename(st.getPath, dst), s"rename ${st.getPath} -> $dst failed")
            dst
          }
        small.foreach(st => fs.delete(st.getPath, false))
        Some(LeafReport(leaf.toString, files.size.toLong, small.size.toLong, bytes, moved.size.toLong))
      }
    }
    fs.delete(scratch, true)
    reports
  }

  /** Data-bearing leaf directories under `root` (dirs containing at
    * least one data file; underscore/dot-prefixed metadata is skipped).
    */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    val entries = fs.listStatus(root).toSeq.filterNot(st => hidden(st.getPath.getName))
    val subdirs = entries.filter(_.isDirectory)
    val here    = if (entries.exists(st => st.isFile && isData(st.getPath.getName))) Seq(root) else Nil
    here ++ subdirs.flatMap(d => leafDirs(fs, d.getPath))
  }

  private def hidden(name: String)  = name.startsWith("_") || name.startsWith(".")
  private def isData(name: String)  = !hidden(name) && name.endsWith(".parquet")

  /** The file-count health metric the compaction decision reads: per
    * leaf dir, file count + total/avg bytes — one listing pass, no data
    * read. (Driver-side metadata, same as planning.)
    */
  def fileStats(spark: SparkSession, root: String): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = leafDirs(fs, new Path(root)).map { leaf =>
      val files = fs.listStatus(leaf).toSeq.filter(st => st.isFile && isData(st.getPath.getName))
      (leaf.toString, files.size.toLong, files.map(_.getLen).sum)
    }
    import spark.implicits._
    rows.toDF("dir", "n_files", "total_bytes")
      .withColumn("avg_bytes", when(col("n_files") > 0, col("total_bytes") / col("n_files")))
  }
}
