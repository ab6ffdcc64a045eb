package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Fleet plan audit at an arbitrary SF: `runMain graft.tools.PlanAudit <sfDir>`.
  *
  * PlanSpec's CartesianProduct / conditioned-BNLJ audit runs at sf0.001;
  * plans can change with statistics (broadcast thresholds, AQE), so this
  * re-runs the same checks against any corpus — sf0.1 or the 10× probe
  * dir — planning every driver query WITHOUT executing it. Same
  * allowlist as PlanSpec: an unconditioned `Cross` BNLJ is the
  * broadcast-tiny-side idiom; a CONDITIONED BNLJ is the all-pairs class,
  * permitted only for the two bounded triangular offset joins.
  */
object PlanAudit {
  /** Queries allowed a mid-pipeline SinglePartition exchange — each one
    * a global window/sort over a DERIVED fold whose row count is capped
    * independent of fact-table size (the same bounded-grid reasoning as
    * the triangular-BNLJ allowlist; most of those queries later replaced
    * the global window with the banded prefix-sum, these kept it because
    * the fold is small enough that the band machinery would cost more).
    * Shared by PlanAudit (driver gate) and PlanSpec (sbt test).
    */
  val singlePartAllowed: Set[String] = Set(
    // global window over the DISTINCT retail-price grid (bounded by the
    // price domain, ~2k values at any SF), not the part table
    "q111_pareto_parts",
    // cumulative sums over the BAND fold — exactly `buckets` (=10) rows
    // reach the exchange whatever the corpus size
    "t18_vocab_growth")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.staticTuning.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // keep in sync with PlanSpec's allowlist (same bounded triangular
    // offset-join idiom: months / score bands / length bands)
    val thetaBnljAllowed = Set("q12_running_revenue", "q74_quality_deciles",
      "q86_global_shard_ids", "q96_peak_concurrency", "q99_lateness_profile",
      "q103_shard_entropy", "q129_kmv_overlap", "q135_hybrid_rrf",
      // q149/q150: the same bounded band-table triangles (price-domain
      // DIV 10000 / DIV 100000 bands — grid size fixed by the price
      // domain, not the corpus)
      "q149_skyline_parts", "q150_weighted_median",
      // q151: q135's rank-within-top-20 triangle over the LIVE lexical
      // leg's TakeOrdered 20-row cut — bounded by the retrieval k
      "q151_hybrid_live")
    // Mid-pipeline SinglePartition allowlist (PlanChecks already exempts
    // keyless one-row rollups and global limits structurally): the
    // BOUNDED-fold global windows/sorts, where the single partition
    // holds a DERIVED grid capped independent of fact rows — never the
    // fact table. Keep in sync with PlanSpec's copy.
    val singlePartAllowed = PlanAudit.singlePartAllowed
    var bad = 0; var ok = 0; var skipped = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val exec = fn(spark, sfDir).queryExecution.executedPlan
        val p = exec.toString
        val cart = p.contains("CartesianProduct")
        val theta = p.linesIterator
          .filter(_.contains("BroadcastNestedLoopJoin"))
          .filterNot(_.contains(", Cross"))
          .toList
        val single =
          if (singlePartAllowed(name)) Nil
          else PlanChecks.singlePartitionOffenders(exec)
        if (cart || (theta.nonEmpty && !thetaBnljAllowed(name)) || single.nonEmpty) {
          bad += 1
          println(s"[planaudit] BAD  $name cartesian=$cart thetaBNLJ=${theta.size}" +
            (if (single.nonEmpty) s" singlePartition=${single.mkString(" | ")}" else ""))
        } else ok += 1
      } catch {
        case e: Exception =>
          skipped += 1
          println(s"[planaudit] SKIP $name: ${e.getMessage.takeWhile(_ != '\n').take(80)}")
      }
    }
    println(s"[planaudit] $sfDir: ok=$ok bad=$bad skipped=$skipped")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
