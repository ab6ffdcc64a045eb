package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Similarity search over the `embeddings` table (SURVEY.md §2.4,
  * s01-s03): brute-force cosine top-k as the correctness baseline, a
  * random-hyperplane-LSH bucketed variant as the scale path, and
  * oracle-checked embedding statistics.
  */
object Similarity {

  /** Deterministic random-hyperplane signature: 8 hyperplanes whose
    * components are sin(j*131 + k*0.7) — fixed, seedless, reproducible on
    * any cluster. Bucket = 8 sign bits packed to an int (0..255).
    */
  def withHyperplaneBucket(embeddings: DataFrame, numPlanes: Int = 8): DataFrame = {
    val contrib = embeddings.select(
      col("vec_id"),
      col("embedding"),
      posexplode(col("embedding")).as(Seq("pos", "x")),
    )
    val sums = (0 until numPlanes).map { j =>
      sum(col("x").cast("double") * sin(lit(j * 131.0) + col("pos") * 0.7)).as(s"p$j")
    }
    val planes = contrib.groupBy("vec_id").agg(sums.head, sums.tail: _*)
    val bucket = (0 until numPlanes)
      .map(j => when(col(s"p$j") > 0, 1 << j).otherwise(0))
      .reduce(_ + _)
    embeddings.join(planes.select(col("vec_id"), bucket.as("bucket")), Seq("vec_id"))
  }

  private def queriesOf(embeddings: DataFrame, n: Int = 10): DataFrame =
    embeddings.filter(col("vec_id") < n)

  /** s01: brute-force cosine top-k — the exact baseline. The query side is
    * tiny and broadcast; ranking keys are rounded so ties break identically
    * everywhere.
    */
  def annBruteForce(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir).withColumn("norm", l2Norm(col("embedding")))
    val q = broadcast(
      queriesOf(emb).select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("norm").as("q_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim6").desc, col("neighbor_id"))
    emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"), col("norm").as("n_norm"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim6", round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim6"), 4).as("cosine"), col("rn"))
  }

  /** s02: LSH-bucketed ANN — probe only the query's hyperplane bucket.
    * This is the 100 TB path: the candidate set per query is the bucket,
    * not the corpus (recall traded for a 256x fan-in cut; multi-probe =
    * union of neighboring buckets, documented not implemented).
    */
  def annLsh(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val bucketed = withHyperplaneBucket(Tables.embeddings(spark, dir)).withColumn("norm", l2Norm(col("embedding")))
    val q = broadcast(queriesOf(bucketed)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"), col("bucket")))
    val w = Window.partitionBy("query_id").orderBy(col("sim6").desc, col("neighbor_id"))
    bucketed
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"), col("norm").as("n_norm"), col("bucket"))
      .join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim6", round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim6"), 4).as("cosine"), col("rn"))
  }

  /** IVF coarse quantizer: deterministic seeds (the first k vec_ids), a
    * fixed number of Lloyd iterations entirely in DataFrame ops (assign =
    * broadcast-centroid argmax-cosine; update = per-dimension mean via
    * posexplode + groupBy). Returns (vec_id, embedding, norm, cid).
    */
  def withIvfCell(embeddings: DataFrame, k: Int = 16, iters: Int = 2): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding")).withColumn("norm", l2Norm(col("embedding")))

    def assign(centroids: DataFrame): DataFrame = {
      val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
      base
        .crossJoin(broadcast(centroids))
        .withColumn("sim", dot(col("embedding"), col("c_emb")) / (col("norm") * col("c_norm")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("norm"), col("cid"))
    }

    def recompute(assigned: DataFrame): DataFrame =
      assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p.getField("m").cast("float")).as("c_emb"))
        .withColumn("c_norm", l2Norm(col("c_emb")))

    val seeds = base
      .filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("c_emb"), col("norm").as("c_norm"))
    val finalCentroids = (1 to iters).foldLeft(seeds)((c, _) => recompute(assign(c)))
    assign(finalCentroids)
  }

  /** s04: IVF-bucketed ANN — probe only the query's cell. Same recall/cost
    * trade as s02 but with data-adaptive cells instead of fixed
    * hyperplanes; nprobe>1 extends it (documented, not implemented).
    */
  def annIvf(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val cells = withIvfCell(Tables.embeddings(spark, dir))
    val q = broadcast(queriesOf(cells)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"), col("cid")))
    val w = Window.partitionBy("query_id").orderBy(col("sim6").desc, col("neighbor_id"))
    cells
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"), col("norm").as("n_norm"), col("cid"))
      .join(q, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim6", round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("sim6"), 4).as("cosine"), col("rn"))
  }

  /** s03: embedding statistics per label (oracle-checked — the per-element
    * sum order matches DuckDB's list_aggregate exactly).
    */
  def embeddingStats(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        round(avg(l2Norm(col("embedding"))), 4).as("avg_norm"),
        round(avg(size(col("embedding"))), 4).as("avg_dim"),
      )
}
