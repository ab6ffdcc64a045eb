package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.{dotLong, toMicro}

/** #366 (r16): the IVF retrain policy RUNS ITSELF — a maintained feed
  * that drifts past the cumulative churn threshold triggers exactly one
  * retrain (new baseline, store ≡ rebuild at the new centroids), a
  * non-drifting feed never retrains, a replayed trigger batch cannot
  * double-retrain (its re-logged drift row carries the new base_seq
  * with zero churn), and a half-finished retrain (marker present) makes
  * probes/folds refuse instead of answering from an inconsistent store.
  */
class IvfRetrainPolicySpec extends SparkSpec {
  private def tmp(prefix: String): String =
    Files.createTempDirectory(
      Paths.get("target/streaming-tmp").toAbsolutePath, prefix).toString

  private def rebuildRows(root: String, m: Map[Long, Array[Float]]): Set[(Int, Long, List[Float])] = {
    import spark.implicits._
    val cents = IvfIndexView.readCentroids(spark, root)
    val w = Window.partitionBy("vec_id").orderBy(col("score").desc, col("cid"))
    m.toSeq.toDF("vec_id", "embedding")
      .withColumn("xi", toMicro(col("embedding")))
      .crossJoin(broadcast(cents))
      .withColumn("score", lit(2L) * dotLong(col("xi"), col("ci")) - col("c2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("cid"), col("vec_id"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toList)).toSet
  }

  private def liveRows(root: String): Set[(Int, Long, List[Float])] =
    IvfIndexView.readIndex(spark, root).select("cid", "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toList)).toSet

  private def baselines(root: String): Long =
    spark.read.parquet(s"$root/drift").filter(col("kind") === "baseline").count()

  test("#366 drifting feed triggers exactly one retrain; non-drifting never; replayed trigger cannot double-retrain") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(vecs.length >= 40, "spec needs a non-trivial corpus")
    def neg(v: Array[Float]): Array[Float] = v.map(x => -x)
    def chg(op: String, id: Long, emb: Array[Float], ts: Long): VecChg = VecChg(op, id, emb, ts, id)
    val policy = IvfIndexView.RetrainPolicy(churnFrac = 0.3, k = 8, iters = 2)

    // ---- drifting leg -------------------------------------------------
    val root = tmp("ivfpol")
    IvfIndexView.create(spark, root, vecs.toSeq.toDF("vec_id", "embedding"), k = 8, iters = 2)
    val inserts = vecs.map { case (id, e) => chg("I", id, e, 1000L) }
    // half the corpus negates — most relocate to other pinned cells, so
    // cumulative churn crosses 0.3 in one batch
    val drift = vecs.filter(_._1 % 2 == 0).map { case (id, e) => chg("U", id, neg(e), 5000L) }

    val input = MemoryStream[VecChg]
    val q = IvfIndexView.maintain(input.toDF(), root, tmp("ivfpolck"),
      keyBuckets = 8, retrainWhen = Some(policy)).start()
    try {
      input.addData(inserts.toSeq: _*); q.processAllAvailable()
      assert(baselines(root) == 1L, "inserts have no old cells — no retrain")
      input.addData(drift.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(baselines(root) == 2L,
      s"drift past the churn threshold must trigger exactly one retrain (got ${baselines(root)})")

    val finalVecs: Map[Long, Array[Float]] =
      vecs.map { case (id, e) => id -> (if (id % 2 == 0) neg(e) else e) }.toMap
    assert(liveRows(root) == rebuildRows(root, finalVecs),
      "after the policy-triggered retrain the store must equal the rebuild at the new centroids")

    // a second policy check at the same state is a no-op (fresh baseline)
    assert(!IvfIndexView.maybeRetrain(spark, root, policy),
      "maybeRetrain right after a retrain must not fire again")
    assert(baselines(root) == 2L)

    // replayed trigger batch: same content, same epoch id — its re-logged
    // drift row carries the NEW base_seq with moved = 0, so no retrain
    IvfIndexView.updateBatch(drift.toSeq.toDF(), root, 8, batchId = 1L)
    assert(!IvfIndexView.maybeRetrain(spark, root, policy),
      "a restart-replayed trigger batch must not double-retrain")
    assert(baselines(root) == 2L)
    assert(liveRows(root) == rebuildRows(root, finalVecs), "replay must not move the index")

    // maintenance continues exactly at the new centroids
    IvfIndexView.updateBatch(Seq(chg("U", 1L, neg(finalVecs(1L)), 9000L)).toDF(), root, 8, batchId = 2L)
    assert(liveRows(root) == rebuildRows(root, finalVecs + (1L -> neg(finalVecs(1L)))))

    // ---- non-drifting leg ---------------------------------------------
    val calm = tmp("ivfcalm")
    IvfIndexView.create(spark, calm, vecs.toSeq.toDF("vec_id", "embedding"), k = 8, iters = 2)
    val input2 = MemoryStream[VecChg]
    val q2 = IvfIndexView.maintain(input2.toDF(), calm, tmp("ivfcalmck"),
      keyBuckets = 8, retrainWhen = Some(policy)).start()
    try {
      input2.addData(inserts.toSeq: _*); q2.processAllAvailable()
      // in-place re-upserts: same embeddings, same cells — zero churn
      input2.addData(vecs.take(20).map { case (id, e) => chg("U", id, e, 6000L) }.toSeq: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(baselines(calm) == 1L, "a non-drifting feed must never retrain")

    // ---- half-retrained store is detectable ----------------------------
    val marker = Paths.get(root, "_retrain_inprogress")
    Files.write(marker, Array.emptyByteArray)
    try {
      val queries = Seq((0L, finalVecs(0L))).toDF("query_id", "embedding")
      intercept[IllegalArgumentException] {
        IvfIndexView.similarTo(spark, root, queries, k = 3, nprobe = 2)
      }
      intercept[IllegalArgumentException] {
        IvfIndexView.stalenessReport(spark, root).collect()
      }
      intercept[IllegalArgumentException] {
        IvfIndexView.updateBatch(Seq(chg("U", 1L, finalVecs(1L), 9900L)).toDF(), root, 8)
      }
    } finally Files.delete(marker)
    // and the recovery verb is retrain itself: it clears the marker
    IvfIndexView.retrain(spark, root, k = 8, iters = 2)
    assert(!Files.exists(marker))
    assert(liveRows(root) == rebuildRows(root, finalVecs + (1L -> neg(finalVecs(1L)))),
      "retrain after a marker must restore the live ≡ rebuild invariant")
  }
}
