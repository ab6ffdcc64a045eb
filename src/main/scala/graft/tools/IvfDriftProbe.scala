package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.VectorFunctions.{dot, l2Norm}
import graft.streaming.IvfIndexView

/** The recall-vs-drift curve for the live IVF index (#356): how far can
  * a corpus drift from the PINNED quantizer before nprobe=2 recall
  * decays, what does the drift log read at each point (the staleness
  * signal an operator watches), and what does RETRAINING cost and buy
  * back? Method: pin centroids on the original corpus, then for rising
  * drift fractions f UPDATE the f-fraction of vectors to their
  * negations (the maximal per-vector motion — the same transform the
  * s13/s15 feeds use), measure
  *   - `err_ratio` + `churn_frac`: the store's own staleness report for
  *     the drift batch — the measured finding is that quantization
  *     error is BLIND to symmetric drift (ratio ≈ 1.0 throughout)
  *     while assignment churn reads the drifted fraction directly,
  *     which is why churn is the retrain trigger;
  *   - `recall_pinned`: recall@3 of the nprobe=2 probe at the PINNED
  *     centroids vs the brute-force truth on the drifted corpus,
  *   - `recall_retrained` + `retrain_sec`: the same after the explicit
  *     [[IvfIndexView.retrain]] (full store rewrite — the cost the
  *     staleness threshold schedules).
  *
  * `runMain graft.tools.IvfDriftProbe [sfDir] [out.json]`
  */
object IvfDriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("bench/ivf_drift.json")
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    val e = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").localCheckpoint(true)
    val n = e.count()

    def drifted(pct: Int) = e.select(col("vec_id"),
      when(pmod(col("vec_id"), lit(100L)) < pct,
        transform(col("embedding"), x => -x)).otherwise(col("embedding")).as("embedding"))

    def queriesOf(corpus: org.apache.spark.sql.DataFrame) =
      corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))

    // brute-force top-3 truth on the drifted corpus (10 queries × n)
    def truth(corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val q = queriesOf(corpus)
        .select(col("query_id"), col("embedding").as("q_emb"))
        .withColumn("q_norm", l2Norm(col("q_emb")))
      val w = Window.partitionBy("query_id").orderBy(col("sim6").desc, col("neighbor_id"))
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
        .withColumn("n_norm", l2Norm(col("n_emb")))
        .crossJoin(broadcast(q))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim6", round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    def probeSet(root: String, corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      IvfIndexView.similarTo(spark, root, queriesOf(corpus), k = 3, nprobe = 2)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(got: Set[(Long, Long)], want: Set[(Long, Long)]): Double =
      if (want.isEmpty) 1.0 else got.intersect(want).size.toDouble / want.size

    val rows = Seq(0, 25, 50, 75, 100).map { pct =>
      val root = java.nio.file.Files.createTempDirectory(s"ivfdrift_$pct").toString
      IvfIndexView.create(spark, root, e, k = 16, iters = 2) // PINNED on the original corpus
      IvfIndexView.updateBatch(
        e.select(lit("I").as("op"), col("vec_id"), col("embedding"),
          lit(1000L).as("tsUs"), col("vec_id").as("seq")),
        root, keyBuckets = 64, batchId = 0L)
      // the corpus DRIFTS: the f-fraction arrives as UPDATES — this is
      // where the store's own churn/error signals get measured
      val corpus = drifted(pct).localCheckpoint(true)
      if (pct > 0)
        IvfIndexView.updateBatch(
          corpus.filter(pmod(col("vec_id"), lit(100L)) < pct)
            .select(lit("U").as("op"), col("vec_id"), col("embedding"),
              lit(2000L).as("tsUs"), col("vec_id").as("seq")),
          root, keyBuckets = 64, batchId = pct.toLong)
      val sig = IvfIndexView.stalenessReport(spark, root)
        .filter(col("kind") === "batch" && col("batch_id") === pct.toLong)
        .collect().headOption
      val ratio = sig.map(_.getDouble(4)).getOrElse(1.0)
      val churn = sig.flatMap(r => Option(r.get(7)).map(_.asInstanceOf[Double])).getOrElse(0.0)
      val want = truth(corpus)
      val rPinned = recall(probeSet(root, corpus), want)
      val t0 = System.nanoTime()
      IvfIndexView.retrain(spark, root, k = 16, iters = 2)
      val retrainSec = (System.nanoTime() - t0) / 1e9
      val rRetrained = recall(probeSet(root, corpus), want)
      f"""{"drift_pct":$pct,"err_ratio":$ratio%.3f,"churn_frac":$churn%.3f,""" +
        f""""recall_pinned":$rPinned%.3f,"recall_retrained":$rRetrained%.3f,""" +
        f""""retrain_sec":$retrainSec%.2f}"""
    }

    val json = s"""{"metric":"ivf_drift","dir":"$dir","n_vectors":$n,"k":16,"nprobe":2,""" +
      s""""points":[${rows.mkString(",")}]}"""
    println(json)
    val p = java.nio.file.Paths.get(out)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
