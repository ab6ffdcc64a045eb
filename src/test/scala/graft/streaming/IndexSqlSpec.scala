package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** r15 — the live-index tier's SQL front door (the r14 verdict's #6):
  * the maintained stores' probes reachable from `cat.sql` as table
  * functions, each ≡ its Scala probe on the store a mixed I/U/D feed
  * materialized, and composable with ordinary SQL around it.
  */
class IndexSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(
      Paths.get("target/streaming-tmp").toAbsolutePath, prefix).toString

  test("SQL table functions probe the live stores: PHRASE_SEARCH / SIMILAR_TO / CELL_COUNTS / INDEX_STALENESS") {
    def vec(id: Long): Array[Float] =
      Array((id + 1).toFloat, ((id * 7) % 5 - 2).toFloat, ((id * 3) % 4).toFloat, 1.0f)
    val ids = (0L until 14L).toSeq

    // mixed I/U/D feeds folded straight through updateBatch
    val postRoot = tmp("sqlpost")
    PostingIndexView.updateBatch(
      ids.map(i => DocChg("I", i, s"spark stream doc $i", 1000L, i)).toDF(),
      postRoot, buckets = 8, keyBuckets = 4)
    PostingIndexView.updateBatch(
      Seq(DocChg("U", 3L, "no phrase here", 2000L, 100L),
        DocChg("D", 5L, "", 2000L, 101L)).toDF(),
      postRoot, buckets = 8, keyBuckets = 4)

    val annRoot = tmp("sqlann")
    AnnIndexView.updateBatch(ids.map(i => VecChg("I", i, vec(i), 1000L, i)).toDF(),
      annRoot, numPlanes = 4, keyBuckets = 4)
    AnnIndexView.updateBatch(Seq(VecChg("D", 9L, vec(9L), 2000L, 100L)).toDF(),
      annRoot, numPlanes = 4, keyBuckets = 4)

    val ivfRoot = tmp("sqlivf")
    IvfIndexView.create(spark, ivfRoot, ids.map(i => (i, vec(i))).toDF("vec_id", "embedding"), k = 4, iters = 1)
    IvfIndexView.updateBatch(ids.map(i => VecChg("I", i, vec(i), 1000L, i)).toDF(), ivfRoot, 4)

    val bmA = tmp("sqlbma")
    val bmB = tmp("sqlbmb")
    BitmapIndexView.updateBatch(
      ids.map(i => BmChg("I", i, if (i % 2 == 0) "red" else "blue", 1000L, i)).toDF(), bmA, 4)
    BitmapIndexView.updateBatch(
      ids.map(i => BmChg("I", i, if (i % 3 == 0) "hot" else "cold", 1000L, i)).toDF(), bmB, 4)

    val cat = new ViewCatalog(spark, tmp("sqlcat"))
    cat.registerIndexStore("post_idx", "posting", postRoot, Map("buckets" -> 8))
    cat.registerIndexStore("ann_idx", "ann", annRoot, Map("planes" -> 4))
    cat.registerIndexStore("ivf_idx", "ivf", ivfRoot, Map("nprobe" -> 2))
    cat.registerIndexStore("bm_a", "bitmap", bmA)
    cat.registerIndexStore("bm_b", "bitmap", bmB)

    // PHRASE_SEARCH ≡ the Scala probe on the same store
    val sqlHits = cat.sql("SELECT doc_id, n_hits FROM PHRASE_SEARCH('post_idx', 'spark stream')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val directHits = PostingIndexView.phraseSearch(spark, postRoot, Seq(Seq("spark", "stream")), 8)
      .select("doc_id", "n_hits").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sqlHits == directHits && sqlHits.nonEmpty, s"$sqlHits vs $directHits")
    assert(!sqlHits.exists(h => h._1 == 3L || h._1 == 5L),
      "updated-away and deleted docs must not match")

    // SIMILAR_TO (ann): query = the store's own row for vec_id 6
    val sqlNbrs = cat.sql("SELECT neighbor_id, rn FROM SIMILAR_TO('ann_idx', 6, 3) ORDER BY rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val q6 = AnnIndexView.readIndex(spark, annRoot).filter(col("vec_id") === 6L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val directNbrs = AnnIndexView.similarTo(spark, annRoot, q6, 3, numPlanes = 4)
      .select("neighbor_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._2).toList
    assert(sqlNbrs == directNbrs && sqlNbrs.nonEmpty, s"$sqlNbrs vs $directNbrs")
    assert(!sqlNbrs.exists(_._1 == 9L), "deleted key must not surface via SQL")

    // SIMILAR_TO (ivf) composes with WHERE
    val ivfTop = cat.sql(
      "SELECT neighbor_id FROM SIMILAR_TO('ivf_idx', 6, 3) WHERE rn = 1").collect()
    assert(ivfTop.length == 1, "ivf probe must compose with WHERE")

    // CELL_COUNTS ≡ the Scala fold, and composes with a filter
    val sqlCells = cat.sql(
      "SELECT a_val, b_val, n_bitmap FROM CELL_COUNTS('bm_a', 'bm_b') WHERE n_bitmap > 0")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val directCells = BitmapIndexView.cellCounts(spark, bmA, bmB)
      .filter(col("n_bitmap") > 0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sqlCells == directCells && sqlCells.nonEmpty)

    // INDEX_STALENESS surfaces the drift log
    val stale = cat.sql("SELECT kind, n_vecs FROM INDEX_STALENESS('ivf_idx')")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(stale.exists(_._1 == "baseline") && stale.exists(_._1 == "batch"),
      s"staleness report must carry baseline + batch rows: ${stale.toList}")

    // pq stores register too (r16, the fifth family): erasure verbs
    // dispatch and INDEX_STALENESS reads its reconstruction-error log
    val pqRoot = tmp("sqlpq")
    PqIndexView.create(spark, pqRoot, ids.map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      m = 4, k = 8, iters = 1)
    PqIndexView.updateBatch(ids.map(i => VecChg("I", i, vec(i), 1000L, i)).toDF(), pqRoot, 4, 4)
    cat.registerIndexStore("pq_idx", "pq", pqRoot)
    val pqStale = cat.sql(
      "SELECT kind, cum_err_ratio FROM INDEX_STALENESS('pq_idx') WHERE kind = 'batch'")
      .collect()
    assert(pqStale.nonEmpty && !pqStale.head.isNullAt(1),
      "pq staleness must surface the cumulative error ratio")

    // SIMILAR_TO over a pq store needs the registered vectors source
    // (a code store cannot reconstruct query embeddings)…
    val ePqNoVec = intercept[IllegalArgumentException] {
      cat.sql("SELECT * FROM SIMILAR_TO('pq_idx', 6, 3)") }
    assert(ePqNoVec.getMessage.contains("vectors source"), ePqNoVec.getMessage)
    // …and with one registered, SQL ≡ the Scala ADC+rerank probe
    val pqVecs = ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
    cat.registerIndexStore("pq_idx", "pq", pqRoot,
      Map("m" -> 4, "rerank" -> 8), vectors = Some(() => pqVecs))
    val pqSql = cat.sql("SELECT neighbor_id, rn FROM SIMILAR_TO('pq_idx', 6, 3) ORDER BY rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val pqQ = pqVecs.filter(col("vec_id") === 6L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val pqDirect = PqIndexView.similarTo(spark, pqRoot, pqQ, 3, m = 4,
        rerank = 8, rerankWith = Some(pqVecs))
      .select("neighbor_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._2).toList
    assert(pqSql == pqDirect && pqSql.nonEmpty, s"$pqSql vs $pqDirect")
    // batch form over the same probe relation
    Seq(2L, 6L).toDF("vec_id").createOrReplaceTempView("probe_ids2")
    val pqBatchRows = cat.sql(
      "SELECT query_id, neighbor_id FROM SIMILAR_TO('pq_idx', TABLE probe_ids2, 2)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pqBatchRows.map(_._1) == Set(2L, 6L), s"pq batch probe: $pqBatchRows")

    cat.forgetKeys(Seq(1L, 2L))
    assert(PqIndexView.keyTraces(spark, pqRoot, 1L) == 0L &&
      PqIndexView.keyTraces(spark, pqRoot, 2L) == 0L,
      "catalog purge must sweep the pq store")

    // wrong-kind and unknown stores raise
    val eKind = intercept[IllegalArgumentException] {
      cat.sql("SELECT * FROM PHRASE_SEARCH('ann_idx', 'spark stream')") }
    assert(eKind.getMessage.contains("kind"), eKind.getMessage)
    val eName = intercept[IllegalArgumentException] {
      cat.sql("SELECT * FROM SIMILAR_TO('nope', 1, 3)") }
    assert(eName.getMessage.contains("no index store"), eName.getMessage)

    // ---- #368 (r16): RELATION-valued probes — TABLE <ids> / <phrases>
    // instead of the single literal the r15 front door allowed
    Seq(2L, 6L, 10L).toDF("vec_id").createOrReplaceTempView("probe_ids")
    val sqlBatch = cat.sql(
      "SELECT query_id, neighbor_id, rn FROM SIMILAR_TO('ann_idx', TABLE probe_ids, 3)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val qBatch = AnnIndexView.readIndex(spark, annRoot)
      .filter(col("vec_id").isin(2L, 6L, 10L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val directBatch = AnnIndexView.similarTo(spark, annRoot, qBatch, 3, numPlanes = 4)
      .select("query_id", "neighbor_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sqlBatch == directBatch && sqlBatch.map(_._1).size > 1,
      s"batch SQL probe must equal the Scala batch probe: $sqlBatch vs $directBatch")

    // ivf flavor, composed with a join back to the probe relation
    val ivfBatch = cat.sql(
      """SELECT p.vec_id AS query_id, s.neighbor_id
        |FROM probe_ids p JOIN SIMILAR_TO('ivf_idx', TABLE probe_ids, 2) s
        |  ON p.vec_id = s.query_id WHERE s.rn = 1""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfQ = IvfIndexView.readIndex(spark, ivfRoot)
      .filter(col("vec_id").isin(2L, 6L, 10L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val ivfDirect = IvfIndexView.similarTo(spark, ivfRoot, ivfQ, 2, nprobe = 2)
      .filter(col("rn") === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfBatch == ivfDirect && ivfBatch.nonEmpty)

    // phrase relation: one probe per row of <phrases>.phrase
    Seq("spark stream", "doc 7").toDF("phrase").createOrReplaceTempView("probe_phrases")
    val sqlPhrases = cat.sql(
      "SELECT phrase, doc_id, n_hits FROM PHRASE_SEARCH('post_idx', TABLE probe_phrases)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val directPhrases = PostingIndexView.phraseSearch(spark, postRoot,
        Seq(Seq("spark", "stream"), Seq("doc", "7")), 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sqlPhrases == directPhrases && sqlPhrases.map(_._1).size == 2,
      s"phrase-relation probe must equal the Scala list probe: $sqlPhrases")
  }
}
