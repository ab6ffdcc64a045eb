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
      "q103_shard_entropy")
    var bad = 0; var ok = 0; var skipped = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = p.contains("CartesianProduct")
        val theta = p.linesIterator
          .filter(_.contains("BroadcastNestedLoopJoin"))
          .filterNot(_.contains(", Cross"))
          .toList
        if (cart || (theta.nonEmpty && !thetaBnljAllowed(name))) {
          bad += 1
          println(s"[planaudit] BAD  $name cartesian=$cart thetaBNLJ=${theta.size}")
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
