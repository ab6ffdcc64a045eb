package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable word-shingling.
  *
  * The naive formulation — `transform(sequence(0, size(words)-k), i =>
  * concat_ws(" ", slice(words, i+1, k)))` — re-evaluates the outer `words`
  * expression (a full regex split of the document) once per shingle
  * position inside an interpreted lambda: O(L^2) per document, on the one
  * core that owns the scan task. Measured here: a single task pinned for
  * 1100+ s on 5k docs.
  *
  * This version explodes each word exactly once and assembles shingles
  * with a sliding window frame, so the heavy pass is vectorized,
  * whole-stage-codegen'd up to the window, and parallel across the
  * `doc_id` shuffle — the formulation that survives 100 TB.
  */
object Shingles {

  /** One row per (doc_id, k-shingle). Docs with fewer than k words emit
    * nothing. Shingles are assembled from k-1 `lead()` columns — scalar
    * window reads, no per-row array allocation (a collect_list frame
    * builds and copies an array per word).
    */
  def shingleRows(docs: DataFrame, k: Int): DataFrame = {
    val w     = Window.partitionBy("doc_id").orderBy("pos")
    val leads = (1 until k).map(i => lead("word", i).over(w).as(s"w$i"))
    val parts = col("word") +: (1 until k).map(i => col(s"w$i"))
    docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "word")))
      .select(col("doc_id") +: col("word") +: leads: _*)
      .filter(col(s"w${k - 1}").isNotNull)
      .select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"))
  }

  /** Distinct 64-bit-hashed k-shingle set per doc: (doc_id, grams). */
  def hashedShingleSets(docs: DataFrame, k: Int): DataFrame =
    shingleRows(docs, k)
      .groupBy("doc_id")
      .agg(array_distinct(collect_list(xxhash64(col("shingle")))).as("grams"))

  /** Min-md5 shingle fingerprint per doc: (doc_id, fingerprint). */
  def md5MinFingerprint(docs: DataFrame, k: Int): DataFrame =
    shingleRows(docs, k)
      .groupBy("doc_id")
      .agg(min(md5(col("shingle"))).as("fingerprint"))
}
