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
      // driver events.parquet is TIMESTAMP(NANOS): read as long; the
      // replica keeps the long column and Tables.events' schema sniff
      // handles it on the probe-read side
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ONE offset shared by every replicated id column: a fixed 1e7
    // collides once a source key passes it (TPC-H o_orderkey does
    // around sf2), silently MERGING rows across replicas instead of
    // duplicating them — and a per-table offset would break the
    // lineitem→orders/part FK alignment between replicas. Global
    // max(id)+1 keeps replicas disjoint AND FK-consistent at any SF.
    val repSpec = Seq(
      "documents"  -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "orders"     -> Seq("o_orderkey"),
      "lineitem"   -> Seq("l_orderkey", "l_partkey"),
      "part"       -> Seq("p_partkey"),
      "events"     -> Seq("event_id"))
    val offset = repSpec.flatMap { case (t, cols) =>
      val aggs = cols.map(c => max(col(c)).as(c))
      val m = spark.read.parquet(s"$src/$t.parquet").agg(aggs.head, aggs.tail: _*).head()
      cols.indices.map(i => m.getLong(i))
    }.max + 1L
    def rep(table: String, idCols: String*): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until copies)
        .map(i => idCols.foldLeft(base)((d, c) => d.withColumn(c, col(c) + lit(i.toLong * offset))))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    rep("documents", "doc_id")
    rep("embeddings", "vec_id")
    // relational/temporal probes, each replica adversarial for a family:
    //  - orders: new order ids, SAME customers -> per-customer windows
    //    (q76, q06) and derived aggregates grow 10x deep
    //  - lineitem: order ids follow orders; part ids follow part, so the
    //    q77 hierarchy gets 10x the parts and q54 10x the orders
    //  - events: new event ids, SAME users -> per-user streams (q78,
    //    q21-q25) grow 10x long
    rep("orders", "o_orderkey")
    rep("lineitem", "l_orderkey", "l_partkey")
    rep("part", "p_partkey")
    rep("events", "event_id")
    // dims pass through unchanged so Catalog.registerAll works on the
    // probe dir (events rides graft.sources.Tables for the ns-ts sniff)
    Seq("region", "nation", "customer", "supplier").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    spark.stop()
  }
}
