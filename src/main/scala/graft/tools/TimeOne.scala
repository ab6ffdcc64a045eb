package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Ad-hoc single-query timer: `runMain graft.tools.TimeOne <sfDir> <key> [reps]`.
  * Mirrors Bench's measurement rules (toRdd.count, repeated executions) so a
  * hotspot found here is the hotspot Bench sees.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys  = args(1).split(",").toSeq
    val reps  = if (args.length > 2) args(2).toInt else 2
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.staticTuning.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    for (key <- keys; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n  = SparkEntry.queries(key)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[timeone] $key rep$r rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
