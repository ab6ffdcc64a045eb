package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-probe data generator: `runMain graft.tools.Make10x <sfDir> <outDir> [copies]`.
  *
  * Unions `copies` offset-id replicas of the sf documents/embeddings
  * tables (the SURVEY §11/§12 probe recipe) — deliberately ADVERSARIAL
  * for dedup and knn ops: every row gains `copies` exact duplicates, so
  * pair-emitting operators face combinatorial output growth while the
  * input grows linearly. Only the two LLM-pipeline tables are written;
  * probe the t/d/s/q74+ keys against the output dir with TimeOne.
  */
object Make10x {
  def main(args: Array[String]): Unit = {
    val src    = args(0)
    val out    = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rep(table: String, idCol: String): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies)
        .map(i => base.withColumn(idCol, col(idCol) + lit(i.toLong * 1000000L)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    rep("documents", "doc_id")
    rep("embeddings", "vec_id")
    spark.stop()
  }
}
