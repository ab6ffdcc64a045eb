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
  * 1100+ s on 5k docs. The first fix (r1) exploded words and assembled
  * shingles with `lead()` windows — O(L) but at the price of shuffling
  * EVERY WORD of the corpus on doc_id before the first shingle exists.
  *
  * r3 removes the shuffle entirely: [[graft.plans.ShingleArray]]
  * (`graft_shingles(text, k)`) is a native codegen'd expression that
  * splits once and joins adjacent words in one O(L) pass per row, so
  * shingling is now a map-side projection on the scan — the formulation
  * that survives 100 TB. The windowed form is kept below as the
  * composed-operator reference; a PlanSpec case asserts the two are
  * row-identical.
  */
object Shingles {

  /** One row per (doc_id, k-shingle), shuffle-free. Docs with fewer than
    * k words emit nothing. With `unicode = true` the text first passes
    * through [[graft.functions.TextFunctions.uSegment]] (NFC + Unicode
    * space folding + per-codepoint CJK isolation), so shingles are stable
    * across NFC/NFD inputs and CJK text shingles per codepoint instead of
    * collapsing to one "word" per sentence — still a map-side projection.
    */
  def shingleRows(docs: DataFrame, k: Int, unicode: Boolean = false): DataFrame = {
    val text =
      if (unicode) graft.functions.TextFunctions.uSegment(col("text")) else col("text")
    docs.select(
      col("doc_id"),
      explode(call_function("graft_shingles", text, lit(k))).as("shingle"))
  }

  /** The r1 windowed formulation (explode words, `lead()` over a doc_id
    * window): same rows as [[shingleRows]], one corpus-wide shuffle more.
    * Kept as the parity reference for the native kernel.
    */
  def windowedShingleRows(docs: DataFrame, k: Int): DataFrame = {
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
