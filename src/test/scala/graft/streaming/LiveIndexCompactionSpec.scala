package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** #370 (r16): the compaction POLICY runs itself — the per-leaf file
  * census flags a churned store, `OPTIMIZE INDEX STORES` compacts
  * exactly the flagged stores, the flag clears, probes are identical
  * throughout, and an already-compact store is a no-op.
  */
class LiveIndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(
      Paths.get("target/streaming-tmp").toAbsolutePath, prefix).toString

  test("#370 census flags a churned store; OPTIMIZE compacts it, clears the flag, probes exact; compact store is a no-op") {
    def vec(id: Long): Array[Float] =
      Array((id + 1).toFloat, ((id * 7) % 5 - 2).toFloat, ((id * 3) % 4).toFloat, 1.0f)
    val ids = (0L until 200L).toSeq

    // numPlanes=2 → 4 bucket leaves, ~50 rows each. The r16 fold writes
    // ONE file per leaf, so the bloat the census exists to catch is
    // synthesized: one leaf's rows re-laid as three small files (same
    // rows — the layout an external bulk ingest, or a pre-r16 engine,
    // leaves behind).
    val annRoot = tmp("cpann")
    AnnIndexView.updateBatch(
      ids.map(i => VecChg("I", i, vec(i), 1000L, i)).toDF(),
      annRoot, numPlanes = 2, keyBuckets = 4)
    locally {
      import scala.jdk.CollectionConverters._
      val leaf = Files.list(Paths.get(annRoot, "data")).iterator().asScala
        .filter(Files.isDirectory(_)).toSeq.minBy(_.getFileName.toString)
      val rows = spark.read.parquet(leaf.toString)
      val splitDir = tmp("cpsplit")
      rows.repartition(3).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(splitDir)
      Files.list(leaf).iterator().asScala.foreach(Files.delete)
      Files.list(Paths.get(splitDir)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .zipWithIndex.foreach { case (p, i) =>
          Files.move(p, leaf.resolve(f"part-split-$i%05d.parquet")): Unit
        }
    }

    val cat = new ViewCatalog(spark, tmp("cpcat"))
    cat.registerIndexStore("ann_idx", "ann", annRoot, Map("planes" -> 2))

    val census = cat.storeFiles("ann_idx", maxFilesPerPart = 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getBoolean(4)))
    assert(census.nonEmpty, "census must see the store's leaves")
    assert(census.exists(_._3),
      s"a churned store must flag leaves at max_files=2: ${census.toList}")
    assert(IndexStoreOps.needsCompaction(spark, "ann", annRoot, 2))

    // probe snapshot before the rewrite
    val queries = Seq((0L, vec(0L)), (5L, vec(5L))).toDF("query_id", "embedding")
    def probe(): Set[(Long, Long, Long)] =
      AnnIndexView.similarTo(spark, annRoot, queries, k = 5, numPlanes = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val before = probe()
    assert(before.nonEmpty)

    // the self-scheduling sweep from SQL
    val audit = cat.sql("OPTIMIZE INDEX STORES MAX_FILES 2").collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getLong(4), r.getLong(5))).toList
    assert(audit == audit.filter(_._1 == "ann_idx") && audit.head._2,
      s"the flagged store must compact: $audit")
    assert(audit.head._4 < audit.head._3,
      s"compaction must shrink the file count: $audit")

    val censusAfter = cat.storeFiles("ann_idx", maxFilesPerPart = 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getBoolean(4)))
    assert(censusAfter.forall(!_._3),
      s"compaction must clear every flag: ${censusAfter.toList}")
    assert(probe() == before, "probes must be identical across the rewrite")

    // second sweep: nothing flagged, nothing compacted
    val audit2 = cat.sql("OPTIMIZE INDEX STORES MAX_FILES 2").collect()
      .map(r => (r.getBoolean(3), r.getLong(4), r.getLong(5))).head
    assert(!audit2._1 && audit2._2 == audit2._3,
      s"an already-compact store must be a no-op: $audit2")

    // maintenance after compaction stays exact
    AnnIndexView.updateBatch(
      Seq(VecChg("U", 3L, vec(77L), 2000L, 500L)).toDF(), annRoot, 2, 4)
    assert(AnnIndexView.keyTraces(spark, annRoot, 3L) > 0L)
  }
}
