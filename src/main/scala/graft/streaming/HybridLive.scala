package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LIVE hybrid retrieval (SURVEY.md §2.3 #371, r16) — q135's Reciprocal
  * Rank Fusion run over two MAINTAINED indexes instead of batch scans:
  * the lexical leg probes the q148 live positional posting store
  * (phrase "spark stream", ranked by hit count), the vector leg probes
  * the s13 live LSH store (top-k cosine neighbors of doc 0's
  * embedding), and rrf = Σ 1/(60 + rank) fuses them as exact integer
  * ppm. This is what a RAG serving stack actually runs: BOTH retrieval
  * legs answer from changefeed-maintained stores, so a document
  * update/delete is visible to hybrid search at the next micro-batch —
  * no batch re-index between a write and its retrievability.
  *
  * Scale shape (inherited, nothing new to pay for): each leg is a
  * partition-pruned probe over its store (term buckets / LSH probe
  * buckets), each leg's top-k comes off a TakeOrdered cut, rank within
  * the k-row list is the broadcast triangular count (q135's bounded
  * idiom — no SinglePartition over table-sized data), and the fusion
  * only ever sees two k-row lists.
  *
  * The two stores' feeds mutate their corpora differently (docs:
  * mod-11 append " spark stream", mod-17 delete; embeddings: mod-11
  * negate, mod-7 delete) — each leg answers over ITS corpus, exactly
  * as two independently-ingesting indexes would in production, and the
  * oracle replays both closed forms.
  */
object HybridLive {

  def hybridRrfLive(spark: SparkSession, dir: String,
      kList: Int = 20, kOut: Int = 10): DataFrame = {
    val postRoot = PostingIndexView.liveStoreFor(spark, dir)
    val annRoot  = AnnIndexView.liveStoreFor(spark, dir)

    // lexical leg: live phrase hits, top-kList by (n_hits, doc_id);
    // rank within the cut via the broadcast triangular count
    val lexTop = PostingIndexView.phraseSearch(spark, postRoot, Seq(Seq("spark", "stream")))
      .filter(col("doc_id") =!= 0L) // the vector leg's query doc stays out of both legs
      .select(col("doc_id"), col("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(kList)
    val lex = lexTop.as("a").join(broadcast(lexTop.as("b")),
        col("b.n_hits") > col("a.n_hits") ||
          (col("b.n_hits") === col("a.n_hits") && col("b.doc_id") < col("a.doc_id")),
        "left")
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg((count(col("b.doc_id")) + 1L).as("lex_rank"))

    // vector leg: the live LSH probe already emits rank-within-k
    val queries = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val vec = AnnIndexView.similarTo(spark, annRoot, queries, k = kList, numPlanes = 8)
      .select(col("neighbor_id").as("doc_id"), col("rn").as("vec_rank"))

    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        (coalesce(expr("1000000 DIV (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 DIV (60 + vec_rank)"), lit(0L))).as("rrf_e6"))
      .orderBy(col("rrf_e6").desc, col("doc_id"))
      .limit(kOut)
  }
}
