package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch source/sink round-trips (SURVEY.md §2.5): JSON interchange and
  * the date-partitioned parquet layout a 100 TB events table would use —
  * with partition pruning asserted in the plan, not assumed.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = new java.io.File(s"target/sources-tmp/$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(d)
    d.mkdirs()
    d.toString
  }

  test("#58 SQL surface: views + native functions reachable from spark.sql") {
    Catalog.registerAll(spark, sf)
    val joined = spark
      .sql("SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .collect()(0).getAs[Long]("n")
    assert(joined > 0)
    val d = spark
      .sql("SELECT graft_dot(embedding, embedding) AS d FROM embeddings LIMIT 1")
      .collect()(0).getAs[Double]("d")
    assert(d > 0)
  }

  test("#58b custom aggregates (graft_top3, graft_mg8, graft_wavg) reachable from spark.sql") {
    Catalog.registerAll(spark, sf)
    val top = spark
      .sql("""SELECT c_mktsegment, graft_top3(c_acctbal, c_custkey) AS top
              FROM customer GROUP BY c_mktsegment""")
      .collect()
    assert(top.length == 5)
    assert(top.forall(_.getSeq[org.apache.spark.sql.Row](1).length <= 3))
    val mg = spark
      .sql("SELECT graft_mg8(l_partkey) AS hh FROM lineitem")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(mg.nonEmpty && mg.length <= 8)
  }

  test("#130 CSV round-trip with schema; malformed rows dropped or dead-lettered by mode") {
    val dir = tmp("csv")
    val ev  = Tables.events(spark, sf).select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(ev.schema).option("header", "true").csv(dir)
    assert(back.count() == ev.count())
    assert(back.agg(sum("event_id")).collect()(0).getLong(0)
      == ev.agg(sum("event_id")).collect()(0).getLong(0))
    // malformed handling: schema'd read over a corrupt file
    val badDir = tmp("csvbad")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(badDir, "bad.csv"),
      "event_id,user_id,event_type,value\n1,7,click,2.5\nnot_a_number,x,oops,zzz\n3,9,view,1.0\n"
        .getBytes("UTF-8"))
    val schema = "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
    val dropped = spark.read.schema(schema).option("header", "true")
      .option("mode", "DROPMALFORMED").csv(badDir)
    // collect(), not count(): count() prunes every column, so the parser
    // never attempts the type conversions that make the row malformed
    assert(dropped.collect().length == 2, "DROPMALFORMED must drop exactly the corrupt row")
    // PERMISSIVE + columnNameOfCorruptRecord = the dead-letter path
    val withCorrupt = spark.read
      .schema(schema + ", _corrupt_record STRING")
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(badDir).cache()
    assert(withCorrupt.filter(col("_corrupt_record").isNotNull).count() == 1,
      "PERMISSIVE must retain the corrupt row for dead-lettering")
    withCorrupt.unpersist()
  }

  test("#131 batch observability: Observation metrics ride the action, no second scan") {
    val obs = new org.apache.spark.sql.Observation("curation")
    val out = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("docs_in"),
        sum(when(col("n_chars") < 50, 1L).otherwise(0L)).as("too_short"))
      .filter(col("n_chars") >= 50)
    val kept = out.count()
    val m = obs.get
    assert(m("docs_in").asInstanceOf[Long] == Tables.documents(spark, sf).count())
    assert(m("docs_in").asInstanceOf[Long] - m("too_short").asInstanceOf[Long] == kept,
      s"observed metrics must reconcile with the output: $m vs kept=$kept")
  }

  test("#56 JSON round-trip preserves rows and schema") {
    val dir = tmp("json")
    val ev  = Tables.events(spark, sf).select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").json(dir)
    val back = spark.read.schema(ev.schema).json(dir)
    assert(back.count() == ev.count())
    assert(back.agg(sum("event_id")).collect()(0).getLong(0) == ev.agg(sum("event_id")).collect()(0).getLong(0))
  }

  test("#165 ORC round-trip preserves rows; filters push down to the ORC scan") {
    val dir = tmp("orc")
    val ev  = Tables.events(spark, sf).select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == ev.count())
    assert(back.agg(sum("event_id")).collect()(0).getLong(0) ==
      ev.agg(sum("event_id")).collect()(0).getLong(0))
    // the columnar contract holds for ORC exactly as for parquet:
    // predicate reaches the scan, projection prunes the read schema
    val q = back.filter(col("user_id") === 7L).select("event_id", "user_id")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"),
      s"filter not pushed to ORC scan:\n$p")
    assert(p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint>"),
      s"projection not pruned at the ORC scan:\n$p")
  }

  test("#57 date-partitioned parquet sink prunes partitions on read") {
    val dir = tmp("part")
    Tables
      .events(spark, sf)
      .withColumn("edate", to_date(col("ts")).cast("string"))
      .write.mode("overwrite").partitionBy("edate").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("edate") === "2024-01-05")
    val plan   = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filter in:\n$plan")
    assert(plan.contains("(edate"), s"edate not in partition filters:\n$plan")
    assert(pruned.count() > 0)
    // pruning really happened: the scan reads fewer files than the table has partitions
    val allParts = new java.io.File(dir).listFiles().count(_.getName.startsWith("edate="))
    assert(allParts > 1, "test table ended up with a single partition")
  }

  test("#185b training-shard sink: q86 output partitioned by shard, one-shard read prunes") {
    // the write side of q86: a data loader asks for `shard i` and the
    // scan must touch only that directory — shard is the partition key
    val dir = tmp("shards")
    graft.operators.TrainingData.globalShardIds(spark, sf)
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val shardDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("shard="))
    assert(shardDirs == 8, s"expected 8 shard partitions, found $shardDirs")
    val one  = spark.read.parquet(dir).filter(col("shard") === 3)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filter in:\n$plan")
    assert(plan.contains("(shard"), s"shard not in partition filters:\n$plan")
    // round trip: the shard holds exactly the seq ≡ 3 (mod 8) examples
    val got = one.select("seq").collect().map(_.getLong(0)).sorted
    val exp = graft.operators.TrainingData.globalShardIds(spark, sf)
      .filter(col("seq") % 8 === 3).select("seq").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exp), "shard content must be the seq mod 8 residue class")
  }

  test("#281 z-order clustered layout: file envelopes tight on BOTH dimensions; single-sort layout prunes only its own") {
    import graft.sources.ZOrderLayout
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsu"))
    val nFiles = 16
    val zDir = tmp("zorder")
    ZOrderLayout.cluster(ev, "user_id", "tsu", nFiles)
      .write.mode("overwrite").parquet(zDir)
    val tDir = tmp("tsorted")
    ev.repartitionByRange(nFiles, col("tsu")).sortWithinPartitions("tsu")
      .write.mode("overwrite").parquet(tDir)

    // the same min/max envelopes a reader's row-group pruning consults
    def env(dir: String) = ZOrderLayout
      .envelopes(spark.read.parquet(dir), Seq("user_id", "tsu")).collect()
    val (zEnv, tEnv) = (env(zDir), env(tDir))
    assert(zEnv.length == nFiles && tEnv.length == nFiles)

    // how many files COULD contain the predicate value (must be read)
    def matching(envs: Array[org.apache.spark.sql.Row], c: String, v: Long) =
      envs.count(r => r.getAs[Long](s"${c}_min") <= v && v <= r.getAs[Long](s"${c}_max"))
    val (uMid, tMid) = {
      val r = ev.agg(expr("percentile(user_id, 0.5D)"), expr("percentile(tsu, 0.5D)")).collect()(0)
      (r.getDouble(0).toLong, r.getDouble(1).toLong)
    }
    val zU = matching(zEnv, "user_id", uMid); val zT = matching(zEnv, "tsu", tMid)
    val tU = matching(tEnv, "user_id", uMid); val tT = matching(tEnv, "tsu", tMid)
    // time-sorted: perfect on time, useless on user (every file spans all users)
    assert(tT <= 2, s"time-sorted layout must prune on time, matched $tT/$nFiles")
    assert(tU >= nFiles - 1, s"time-sorted layout can't prune on user ($tU/$nFiles) — precondition")
    // z-order: strictly better than no-pruning on BOTH dimensions at once
    // (√files-wide envelopes: expect ≲ half the files on a point predicate)
    assert(zU <= nFiles / 2, s"z-order user envelope too wide: $zU/$nFiles files match")
    assert(zT <= nFiles / 2, s"z-order time envelope too wide: $zT/$nFiles files match")

    // layout is an ORDER discipline only: content round-trips exactly
    val got = spark.read.parquet(zDir).select("event_id").collect().map(_.getLong(0)).sorted
    val exp = ev.select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exp), "z-order write must not drop or duplicate rows")
  }

  test("#285 small-file compaction: per-leaf rewrite to target size, big files untouched, content exact, idempotent") {
    val dir = tmp("compact")
    val ev  = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("user_id"))
    // the small-file disease: 12 files per partition leaf
    ev.repartition(12).write.partitionBy("event_type").mode("overwrite").parquet(dir)
    // plus one file per leaf that is already big enough to leave alone
    val statsBefore = Compaction.fileStats(spark, dir).collect()
    assert(statsBefore.forall(_.getAs[Long]("n_files") >= 12), "precondition: many small files")
    val bigBytes = statsBefore.map(_.getAs[Long]("total_bytes")).max * 3

    val reports = Compaction.compact(spark, dir, targetBytes = bigBytes, smallBytes = bigBytes)
    assert(reports.nonEmpty, "compaction must touch every fragmented leaf")
    // every leaf collapses to ceil(bytes/target) = 1 file
    val statsAfter = Compaction.fileStats(spark, dir).collect()
    assert(statsAfter.forall(_.getAs[Long]("n_files") == 1),
      s"expected 1 file per leaf, got ${statsAfter.map(_.getAs[Long]("n_files")).toSeq}")
    // content round-trips exactly (partition column restored on read)
    val got = spark.read.parquet(dir).select("event_id").collect().map(_.getLong(0)).sorted
    val exp = ev.select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exp), "compaction must not drop or duplicate rows")
    // files at/over smallBytes stay byte-identical in place: re-running
    // finds nothing under the threshold (single merged file per leaf is
    // counted alone → skipped) — idempotence
    assert(Compaction.compact(spark, dir, bigBytes, bigBytes).isEmpty,
      "second pass must be a no-op")
    // and a pass whose size threshold classifies every file as big
    // touches nothing either (the big-files-stay-in-place contract)
    assert(Compaction.compact(spark, dir, bigBytes, smallBytes = 2).isEmpty,
      "files at/over smallBytes must be left alone")
    // scratch dir cleaned up
    assert(!new java.io.File(s"$dir/_graft_compact_tmp").exists())
  }

  test("#286 file-skipping index: range read opens only envelope-matching files; stale index fails closed") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsu"))
    val dir = tmp("skipidx")
    // time-clustered layout: tsu envelopes are tight, so a narrow time
    // range should touch a small fraction of the 16 files
    ev.repartitionByRange(16, col("tsu")).sortWithinPartitions("tsu")
      .write.mode("overwrite").parquet(dir)
    SkippingIndex.build(spark, dir, Seq("tsu", "user_id"))

    val (lo, hi) = {
      val r = ev.agg(expr("percentile(tsu, 0.50D)"), expr("percentile(tsu, 0.55D)")).collect()(0)
      (r.getDouble(0).toLong, r.getDouble(1).toLong)
    }
    val pruned = SkippingIndex.readRange(spark, dir, "tsu", lit(lo), lit(hi))
    val expect = spark.read.parquet(dir).filter(col("tsu") >= lo && col("tsu") <= hi)
    // correctness: identical rows to the full-scan filter
    assert(pruned.select("event_id").collect().map(_.getLong(0)).sorted
      .sameElements(expect.select("event_id").collect().map(_.getLong(0)).sorted))
    // pruning: the scan's file list shrank (driver-side, before planning)
    val opened = pruned.select("event_id").inputFiles.length
    assert(opened <= 4, s"a ~5%-range read should open few of 16 files, opened $opened")

    // stale index fails CLOSED: append files AFTER the build — their rows
    // must still appear (unindexed files union into every read)
    ev.filter(col("tsu") >= lo && col("tsu") <= hi).limit(7)
      .withColumn("event_id", col("event_id") + 1000000000L)
      .coalesce(1).write.mode("append").parquet(dir)
    val after = SkippingIndex.readRange(spark, dir, "tsu", lit(lo), lit(hi))
    assert(after.filter(col("event_id") >= 1000000000L).count() == 7,
      "rows in unindexed files must not be skipped")
  }

  test("#293 incremental index maintenance: update scans only new files, restores pruning, is idempotent") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsu"))
    val dir = tmp("skipidx_upd")
    ev.repartitionByRange(16, col("tsu")).sortWithinPartitions("tsu")
      .write.mode("overwrite").parquet(dir)
    SkippingIndex.build(spark, dir, Seq("tsu"))

    val (lo, hi) = {
      val r = ev.agg(expr("percentile(tsu, 0.50D)"), expr("percentile(tsu, 0.55D)")).collect()(0)
      (r.getDouble(0).toLong, r.getDouble(1).toLong)
    }
    // append OUT-OF-RANGE batches (a streaming sink's new files): before
    // update they fail closed into every read; after, they prune away
    val outOfRange = ev.filter(col("tsu") < lo).limit(50)
      .withColumn("event_id", col("event_id") + 2000000000L)
    outOfRange.repartition(2).write.mode("append").parquet(dir)
    val before = SkippingIndex.readRange(spark, dir, "tsu", lit(lo), lit(hi))
      .select("event_id").inputFiles.length

    val indexedNew = SkippingIndex.update(spark, dir, Seq("tsu"))
    assert(indexedNew == 2, s"update must index exactly the 2 appended files, got $indexedNew")
    val afterUpd = SkippingIndex.readRange(spark, dir, "tsu", lit(lo), lit(hi))
    assert(afterUpd.select("event_id").inputFiles.length < before,
      "freshly indexed out-of-range files must prune away after update")
    // correctness unchanged vs the full-scan filter
    assert(afterUpd.select("event_id").collect().map(_.getLong(0)).sorted.sameElements(
      spark.read.parquet(dir).filter(col("tsu") >= lo && col("tsu") <= hi)
        .select("event_id").collect().map(_.getLong(0)).sorted))
    // idempotent: a second update finds nothing new
    assert(SkippingIndex.update(spark, dir, Seq("tsu")) == 0)
    // column-set drift is refused, not silently forked
    intercept[IllegalArgumentException] {
      SkippingIndex.update(spark, dir, Seq("tsu", "user_id"))
    }
  }

  test("#293b maintenance interplay: compaction deletes indexed files — reads survive, update prunes dead entries") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("tsu"))
    val dir = tmp("skipidx_compact")
    ev.repartitionByRange(8, col("tsu")).sortWithinPartitions("tsu")
      .write.mode("overwrite").parquet(dir)
    SkippingIndex.build(spark, dir, Seq("tsu"))
    val (lo, hi) = {
      val r = ev.agg(expr("percentile(tsu, 0.50D)"), expr("percentile(tsu, 0.55D)")).collect()(0)
      (r.getDouble(0).toLong, r.getDouble(1).toLong)
    }
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val expect = ids(spark.read.parquet(dir).filter(col("tsu") >= lo && col("tsu") <= hi))

    // compact EVERYTHING (all 8 files under the threshold): the rewrite
    // deletes every file the manifest knows about
    val reports = Compaction.compact(spark, dir, targetBytes = 1L << 30, smallBytes = 1L << 30)
    assert(reports.nonEmpty && reports.head.smallFiles == 8)

    // every manifest entry is now dead — the read must drop them (not
    // hand the scan dead paths) and fail CLOSED into the live files
    assert(ids(SkippingIndex.readRange(spark, dir, "tsu", lit(lo), lit(hi))) == expect,
      "a fully stale manifest must degrade to the full-scan answer, not crash")

    // update prunes the dead entries and indexes the compacted files:
    // manifest rows == live data files, and pruning works again
    val indexedNew = SkippingIndex.update(spark, dir, Seq("tsu"))
    assert(indexedNew >= 1, "the compacted file(s) must be newly indexed")
    val manifest = spark.read.parquet(s"$dir/_graft_index/envelopes")
    assert(manifest.count() == spark.read.parquet(dir).inputFiles.length,
      "after update the manifest must hold exactly the live files")
    assert(ids(SkippingIndex.readRange(spark, dir, "tsu", lit(lo), lit(hi))) == expect)
  }

  test("#321 partition-pruned MERGE: only touched buckets rewrite; LWW content exact; deletes clear; idempotent") {
    import spark.implicits._
    val dir = tmp("upsert")
    val B   = 8
    // 64 keys across 8 buckets, one data column
    val base = (0L until 64L).map(k => (k, new java.sql.Timestamp(1700000000000L + k), k, s"v$k"))
      .toDF("key", "ts", "seq", "payload")
    PartitionedUpsert.createTable(base, dir, B)
    val before = PartitionedUpsert.partitionFiles(dir)
    assert(before.keySet == (0L until B.toLong).toSet, "one partition per bucket")
    // a batch touching ONLY buckets 1 and 3: an update (newer ts), a
    // stale update (older ts — must LOSE), an insert, and a delete
    val batch = Seq(
      ("update", 1L,  new java.sql.Timestamp(1700000100000L), 100L, "v1new"),
      ("update", 9L,  new java.sql.Timestamp(1600000000000L), 99L,  "stale"),
      ("insert", 65L, new java.sql.Timestamp(1700000100000L), 101L, "fresh"), // 65 % 8 = 1
      ("delete", 3L,  new java.sql.Timestamp(1700000100000L), 102L, ""),
    ).toDF("op", "key", "ts", "seq", "payload")
    val touched = PartitionedUpsert.merge(spark, batch, dir, B)
    assert(touched == Seq(1L, 3L), s"touched buckets: $touched")
    // untouched partitions keep their EXACT files — never rewritten
    val after = PartitionedUpsert.partitionFiles(dir)
    (0L until B.toLong).filterNot(Set(1L, 3L)).foreach { b =>
      assert(after(b) == before(b), s"bucket $b must not rewrite: ${after(b)} vs ${before(b)}")
    }
    assert(after(1L) != before(1L) && after(3L) != before(3L), "touched buckets rewrote")
    // content: LWW winners, stale loser ignored, insert present, delete gone
    val rows = PartitionedUpsert.read(spark, dir)
      .select("key", "payload").as[(Long, String)].collect().toMap
    assert(rows(1L) == "v1new" && rows(9L) == "v9" && rows(65L) == "fresh" &&
      !rows.contains(3L) && rows.size == 64, s"merged content: ${rows.toSeq.sorted.take(8)}")
    // idempotent: replaying the SAME batch converges to the same state
    // (batch beats table at equal (ts, seq))
    PartitionedUpsert.merge(spark, batch, dir, B)
    val rows2 = PartitionedUpsert.read(spark, dir)
      .select("key", "payload").as[(Long, String)].collect().toMap
    assert(rows2 == rows, "replay must converge")
    // a delete-ALL batch for bucket 2 clears its directory (the dynamic
    // -overwrite blind spot handled explicitly)
    val wipe = (0L until 64L).filter(_ % 8 == 2)
      .map(k => ("delete", k, new java.sql.Timestamp(1700000200000L), 200L + k, ""))
      .toDF("op", "key", "ts", "seq", "payload")
    PartitionedUpsert.merge(spark, wipe, dir, B)
    assert(PartitionedUpsert.read(spark, dir).filter(col("key") % 8 === 2).count() == 0,
      "bucket 2 fully deleted")
    // the pruned read: only the touched partitions enter the merge scan
    val pruned = spark.read.parquet(dir).filter(col("kb").isin(1L, 3L))
      .queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters") || !pruned.contains("kb=2"),
      "bucket filter must prune at the scan")
  }
}
