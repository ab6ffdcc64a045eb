package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** Scaling probe for the BPE trainer's driver-orchestration cost:
  * `runMain graft.tools.BpeProbe <sfDir> [numMerges]` prints rounds
  * (≈ driver job groups) for the B=8 fixed-batch path vs the adaptive
  * path at the same merge horizon — the r5 verdict's #6 measurement.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir    = args(0)
    val merges = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val ((b8, rounds8), t8)   = time(Bpe.trainMergesWithRounds(spark, dir, merges, batch = 8))
    val ((ad, roundsAd), tAd) = time(Bpe.trainMergesAdaptive(spark, dir, merges))
    println(f"""{"probe":"bpe","dir":"$dir","horizon":$merges,""" +
      f""""b8":{"merges":${b8.size},"rounds":$rounds8,"sec":$t8%.1f},""" +
      f""""adaptive":{"merges":${ad.size},"rounds":$roundsAd,"sec":$tAd%.1f},""" +
      f""""round_ratio":${rounds8.toDouble / math.max(1, roundsAd)}%.1f}""")
    spark.stop()
  }
}
