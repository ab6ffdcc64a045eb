package graft
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
    // Each query executes twice and the reported time is the per-query
    // minimum: run 1 additionally pays janino/JIT compilation (5-13 s for
    // the codegen-heavy dedup operators, measured) that a long-running
    // changefeed server has always already paid, and taking the min also
    // rides out this host's bursty CPU-steal noise (back-to-back totals
    // of 38 s and 258 s were observed for identical code). toRdd forces
    // full evaluation of every output column; a plain count() would let
    // Catalyst prune projection-only work.
    // A query that throws is reported as -1 (and counted in "failures"),
    // never as its near-zero failure-path elapsed time — a broken query
    // must make the benchmark look broken, not fast.
    def timeAll(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
    val run1 = timeAll()
    val run2 = timeAll()
    val results = run1.map { case (k, v) =>
      k -> (if (v < 0 || run2(k) < 0) -1.0 else math.min(v, run2(k)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failures = results.values.count(_ < 0)
    val total    = results.values.filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
