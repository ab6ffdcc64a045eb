package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.VectorFunctions.{dot, l2Norm}
import graft.streaming.PqIndexView

/** The recall-vs-drift curve for the live PQ index (#369) — the
  * [[IvfDriftProbe]] method pointed at the COMPRESSED family: how far
  * can a corpus drift from the PINNED codebooks before the ADC +
  * rerank probe's recall decays, what do the store's own staleness
  * signals read at each point, and what does retraining cost and buy
  * back? Two drift MODES, because PQ's two signals see different
  * things:
  *
  *   - NEGATION (the symmetric motion): per-subspace codes flip, so
  *     `churn_frac` reads the drifted fraction while the
  *     reconstruction-error ratio stays ≈ 1 (|−x − c'| at the nearest
  *     code c' ≈ |x − c| when the codebook has symmetric mass);
  *   - SCALE ×8 (the expansive motion): vectors leave every codebook
  *     cell, so `err_ratio` blows up — the signal the PQ retrain
  *     policy triggers on.
  *
  * `runMain graft.tools.PqDriftProbe [sfDir] [out.json]`
  */
object PqDriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("bench/pq_drift.json")
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    val e = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").localCheckpoint(true)
    val n = e.count()

    def drifted(pct: Int, mode: String) = e.select(col("vec_id"),
      when(pmod(col("vec_id"), lit(100L)) < pct,
        if (mode == "negate") transform(col("embedding"), x => -x)
        else transform(col("embedding"), x => x * lit(8.0f)))
        .otherwise(col("embedding")).as("embedding"))

    def queriesOf(corpus: org.apache.spark.sql.DataFrame) =
      corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))

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

    // rerank kept NARROW (8 ADC candidates for top-3) so the curve
    // exposes the quantizer: a 60-wide rerank would hide code drift
    // behind the exact second stage at this corpus size
    def probeSet(root: String, corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      PqIndexView.similarTo(spark, root, queriesOf(corpus), k = 3, m = 4,
          rerank = 8, rerankWith = Some(corpus))
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(got: Set[(Long, Long)], want: Set[(Long, Long)]): Double =
      if (want.isEmpty) 1.0 else got.intersect(want).size.toDouble / want.size

    val rows = for (mode <- Seq("negate", "scale"); pct <- Seq(0, 25, 50, 100)) yield {
      val root = java.nio.file.Files.createTempDirectory(s"pqdrift_${mode}_$pct").toString
      PqIndexView.create(spark, root, e, m = 4, k = 16, iters = 2) // PINNED on the original corpus
      PqIndexView.updateBatch(
        e.select(lit("I").as("op"), col("vec_id"), col("embedding"),
          lit(1000L).as("tsUs"), col("vec_id").as("seq")),
        root, m = 4, keyBuckets = 64, batchId = 0L)
      val corpus = drifted(pct, mode).localCheckpoint(true)
      if (pct > 0)
        PqIndexView.updateBatch(
          corpus.filter(pmod(col("vec_id"), lit(100L)) < pct)
            .select(lit("U").as("op"), col("vec_id"), col("embedding"),
              lit(2000L).as("tsUs"), col("vec_id").as("seq")),
          root, m = 4, keyBuckets = 64, batchId = pct.toLong)
      val sig = PqIndexView.stalenessReport(spark, root)
        .filter(col("kind") === "batch" && col("batch_id") === pct.toLong)
        .collect().headOption
      val ratio = sig.map(_.getDouble(4)).getOrElse(1.0)
      val churn = sig.flatMap(r => Option(r.get(7)).map(_.asInstanceOf[Double])).getOrElse(0.0)
      val want = truth(corpus)
      val rPinned = recall(probeSet(root, corpus), want)
      val t0 = System.nanoTime()
      PqIndexView.retrain(spark, root, corpus, m = 4, k = 16, iters = 2, keyBuckets = 64)
      val retrainSec = (System.nanoTime() - t0) / 1e9
      val rRetrained = recall(probeSet(root, corpus), want)
      f"""{"mode":"$mode","drift_pct":$pct,"err_ratio":$ratio%.3f,"churn_frac":$churn%.3f,""" +
        f""""recall_pinned":$rPinned%.3f,"recall_retrained":$rRetrained%.3f,""" +
        f""""retrain_sec":$retrainSec%.2f}"""
    }

    val json = s"""{"metric":"pq_drift","dir":"$dir","n_vectors":$n,"m":4,"k":16,"rerank":8,""" +
      s""""points":[${rows.mkString(",")}]}"""
    println(json)
    val p = java.nio.file.Paths.get(out)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
