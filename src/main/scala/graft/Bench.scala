package graft
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.staticTuning.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    // Warm up IO + codegen so the first timed query isn't charged for
    // session bring-up. toRdd forces actual column decode — a bare count()
    // reads only parquet metadata and warms nothing.
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try graft.sources.Tables.table(spark, sfDir, t).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    // Each query executes THREE times and the reported time is the
    // per-query minimum: run 1 additionally pays janino/JIT compilation
    // (5-13 s for the codegen-heavy dedup operators, measured) that a
    // long-running changefeed server has always already paid, and
    // min-of-3 rides out this host\'s bursty CPU-steal noise
    // (back-to-back totals of 38 s and 258 s were observed for
    // identical code; r5→r6 drifted ~20% uniformly from steal alone).
    // toRdd forces full evaluation of every output column; a plain
    // count() would let Catalyst prune projection-only work.
    // A query that throws is reported as -1 (and counted in "failures"),
    // never as its near-zero failure-path elapsed time — a broken query
    // must make the benchmark look broken, not fast.
    // SPARK_GRAFT_QUERIES (comma-separated names): restrict the timed
    // set — the A/B diagnostic lever for isolating whether a drift is
    // per-query or an artifact of the growing suite itself (JIT/code
    // -cache pressure scales with how many codegen'd queries one JVM
    // executes; 138 queries × 3 runs is ~414 compiled plans)
    val onlySet = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def timeAll(): Map[String, Double] =
      SparkEntry.queries.toSeq.filter(q => onlySet.forall(_.contains(q._1)))
        .sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
    val runs = Seq(timeAll(), timeAll(), timeAll())
    val results = runs.head.map { case (k, _) =>
      val vs = runs.map(_(k))
      k -> (if (vs.exists(_ < 0)) -1.0 else vs.min)
    }
    def fmtQs(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // The live-index queries memoize their store FOLD on the first call
    // per corpus (the served-index discipline), so their min-of-3 is
    // probe cost only and run 1 carries the one-time I/U/D history
    // replay. Record that fold separately so `min` can't be misread as
    // the full cost: store_build_sec ≈ run1 − min(run2, run3).
    // q151 probes the q148 + s13 stores; alphabetical order means its
    // run 1 builds the ANN store (s13 then memo-hits), so it belongs in
    // the split too
    val liveQueries = Seq("s13_ann_live_index", "s15_ann_ivf_live",
      "s16_ann_pq_live", "q147_bitmap_live", "q148_phrase_live",
      "q151_hybrid_live")
    val storeBuild = liveQueries.flatMap { q =>
      runs.head.get(q).flatMap { r1 =>
        val steady = Seq(runs(1).get(q), runs(2).get(q)).flatten.filter(_ >= 0)
        if (r1 >= 0 && steady.nonEmpty) Some(q -> math.max(0.0, r1 - steady.min)) else None
      }
    }.toMap
    val failures = results.values.count(_ < 0)
    val total    = results.values.filter(_ >= 0).sum
    // q01 (scan+filter+project, code pinned since r1) is the DRIFT
    // NORMALIZER: round-over-round regressions are attributable only
    // relative to it — queries_norm carries each query / q01, so a
    // uniform host-steal drift shows as q01 moving with everything else
    // while a real per-query regression moves its normalized value.
    val normT = results.getOrElse("q01_filter_project", -1.0)
    val normed =
      if (normT > 0) results.map { case (k, v) => k -> (if (v < 0) -1.0 else v / normT) }
      else Map.empty[String, Double]
    // The driver's contract line: total + the per-query map in ONE JSON
    // line (r17 fix — see build.sbt outputStrategy note: until this round
    // every stdout line carried an "[info] " prefix and could not parse).
    // Seconds are rounded to 0.1 ms in the stdout map to keep the line
    // lean; the committed artifacts below keep full precision. Printed
    // twice — before the artifact writes AND as the final stdout line —
    // so both first-match and last-match scrapers find the same line.
    def fmtQs4(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) =>
        s"\"" + k + "\":" + BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      }.mkString("{", ",", "}")
    val sfName = new java.io.File(sfDir).getName
    // A SPARK_GRAFT_QUERIES subset is a PROBE: it must never clobber the
    // full-fleet artifacts of record (r16 lost bench/full_sf0.1.json to an
    // 8-core probe and r17 nearly lost bench/full_sf1.json to a 1-query
    // probe exactly this way). Probes land in probe-scoped files; the
    // round-named BENCH_r*_full.json is written only by full runs.
    val isProbe = onlySet.isDefined
    val artifactName = if (isProbe) s"probe_$sfName.json" else s"full_$sfName.json"
    val contractLine =
      s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"runs":3,""" +
        s""""n_queries":${results.size},"normalizer":"q01_filter_project","normalizer_sec":$normT,""" +
        s""""store_build_sec":${fmtQs4(storeBuild)},"queries":${fmtQs4(results)},""" +
        s""""artifact":"bench/$artifactName","sf":"$sfDir"}"""
    println(contractLine)
    // the driver records only a stdout tail, so the COMPLETE per-query
    // artifact (all runs + min + normalized) goes to a committed file —
    // every timing diffable round-over-round
    val fullJson =
      s"""{"sf":"$sfName","cpus":$cpus,"failures":$failures,"total_sec":$total,""" +
        s""""normalizer":"q01_filter_project","normalizer_sec":$normT,""" +
        s""""store_build_sec":${fmtQs(storeBuild)},""" +
        s""""runs":[${runs.map(fmtQs).mkString(",")}],""" +
        s""""min":${fmtQs(results)},"normalized":${fmtQs(normed)}}"""
    val outDir = java.nio.file.Paths.get("bench")
    java.nio.file.Files.createDirectories(outDir)
    java.nio.file.Files.write(outDir.resolve(artifactName),
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Belt-and-braces vs the driver's 2000-char stdout tail: the
    // complete artifact also lands in a ROOT-level round-named file
    // (round inferred as max existing BENCH_r* + 1, since the driver
    // writes its own file only after this run).
    // round = max(driverMax + 1, fullMax): the driver's BENCH_rN.json
    // lands AFTER the round (so +1), while a BENCH_rN_full.json we
    // ourselves wrote is THIS round (repeated Bench runs in one round —
    // sf1/sf3 headline passes before the full fleet — must relabel the
    // same round, not escalate it; r15 lesson). Driver files are
    // untracked, so on a fresh checkout fullMax alone carries the round.
    val names = java.nio.file.Files.list(java.nio.file.Paths.get("."))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    def maxOf(re: scala.util.matching.Regex): Int =
      names.flatMap(n => re.findFirstMatchIn(n).map(_.group(1).toInt)).foldLeft(0)(math.max)
    val roundN = math.max(maxOf("^BENCH_r(\\d+)\\.json$".r) + 1,
      maxOf("^BENCH_r(\\d+)_full\\.json$".r))
    if (!isProbe) java.nio.file.Files.write(
      java.nio.file.Paths.get(f"BENCH_r$roundN%02d_full.json"),
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(contractLine)
    spark.stop()
  }
}
