package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.Compaction

/** Physical-maintenance policy layer for the live-index stores (#370,
  * r16 — the r15 verdict's "compactStore exists but nothing decides
  * WHEN"): a files-per-partition census over each family's directories
  * and the self-scheduling OPTIMIZE that runs compaction exactly when
  * the census flags a leaf — the same measurement→policy closure the
  * IVF retrain loop got ([[IvfIndexView.RetrainPolicy]]).
  *
  * Why files-per-leaf is the right trigger: every dynamic partition
  * overwrite leaves up to shuffle-partitions files in each touched
  * leaf, so a churn-heavy feed accretes small files even though row
  * counts stay bounded; probe cost then scales with file count (footer
  * opens), not bytes. The census is driver-side METADATA work — one
  * directory listing per store, the same altitude as a planner listing
  * files — and the compaction it schedules moves each byte once.
  */
object IndexStoreOps {

  /** One leaf directory's census row. */
  final case class LeafCensus(dir: String, files: Long, bytes: Long, flagged: Boolean)

  /** The physical directories of each live-index store family. */
  def storeDirs(kind: String, root: String): Seq[String] = kind match {
    case "ann" | "ivf" | "pq" => Seq(s"$root/data", s"$root/keys")
    case "bitmap"             => Seq(s"$root/bm", s"$root/keys")
    case "posting"            => Seq(s"$root/post", s"$root/keys")
    case other => throw new IllegalArgumentException(s"unknown index-store kind $other")
  }

  /** Per-leaf file census over a store's directories: a LEAF is any
    * directory directly holding parquet files (a partition dir, or an
    * unpartitioned root). `flagged` = more files than
    * `maxFilesPerPart` — the leaf pays more in footer opens than the
    * data justifies and compaction would help.
    */
  def fileCensus(spark: SparkSession, kind: String, root: String,
      maxFilesPerPart: Int = 8): Seq[LeafCensus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    storeDirs(kind, root).flatMap { d =>
      val p = new Path(d)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else {
        def leaves(dir: Path): Seq[Path] = {
          val entries = fs.listStatus(dir).toSeq
          val subdirs = entries.filter(e =>
            e.isDirectory && !e.getPath.getName.startsWith("_"))
          val hasFiles = entries.exists(e =>
            e.isFile && e.getPath.getName.endsWith(".parquet"))
          (if (hasFiles) Seq(dir) else Nil) ++ subdirs.flatMap(s => leaves(s.getPath))
        }
        leaves(p).map { leaf =>
          val fstat = fs.listStatus(leaf).toSeq
            .filter(e => e.isFile && e.getPath.getName.endsWith(".parquet"))
          LeafCensus(leaf.toUri.getPath, fstat.length.toLong,
            fstat.map(_.getLen).sum, fstat.length > maxFilesPerPart)
        }
      }
    }
  }

  /** Does any leaf of this store exceed the file threshold? */
  def needsCompaction(spark: SparkSession, kind: String, root: String,
      maxFilesPerPart: Int = 8): Boolean =
    fileCensus(spark, kind, root, maxFilesPerPart).exists(_.flagged)

  /** The self-scheduling OPTIMIZE: compact this store IFF the census
    * flags it. Returns (ranCompaction, perLeafReports). Probe results
    * are unchanged by construction (same rows, fewer files — the
    * [[Compaction.compact]] contract).
    */
  def compactIfNeeded(spark: SparkSession, kind: String, root: String,
      maxFilesPerPart: Int = 8,
      targetBytes: Long = 64L << 20,
      smallBytes: Long = 16L << 20): (Boolean, Seq[Compaction.LeafReport]) =
    if (!needsCompaction(spark, kind, root, maxFilesPerPart)) (false, Nil)
    else {
      val reports = kind match {
        case "ann"     => AnnIndexView.compactStore(spark, root, targetBytes, smallBytes)
        case "bitmap"  => BitmapIndexView.compactStore(spark, root, targetBytes, smallBytes)
        case "posting" => PostingIndexView.compactStore(spark, root, targetBytes, smallBytes)
        case "ivf"     => IvfIndexView.compactStore(spark, root, targetBytes, smallBytes)
        case "pq"      => PqIndexView.compactStore(spark, root, targetBytes, smallBytes)
      }
      (true, reports)
    }
}
