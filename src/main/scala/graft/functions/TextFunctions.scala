package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * operators. All are composed from codegen'd built-ins and higher-order
  * functions — no UDFs — so they stay inside whole-stage codegen and are
  * evaluated where the data lives.
  */
object TextFunctions {

  /** Whitespace tokenization (leading/trailing space trimmed first). */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** CJK codepoint class, spelled as explicit ranges so the Java-regex
    * (Spark) and RE2 (DuckDB oracle) forms are character-identical:
    * Hiragana+Katakana U+3040-30FF, CJK ext-A U+3400-4DBF, CJK unified
    * U+4E00-9FFF, Hangul syllables U+AC00-D7AF.
    */
  val CjkClass: String =
    "[\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}]"

  /** Unicode NFC normalization (native [[graft.plans.NormalizeString]]). */
  def normalized(text: Column, form: String = "NFC"): Column =
    call_function("graft_normalize", text, lit(form))

  /** Unicode-robust segmentation: NFC-normalize (decomposed accents and
    * reordered marks stop fragmenting hashes), fold every Unicode space
    * separator (U+3000 ideographic space, NBSP, ...) to ASCII space, then
    * isolate each CJK codepoint with surrounding spaces — the standard
    * per-character segmentation for unsegmented scripts. The result feeds
    * the SAME whitespace-split machinery every operator already uses, so
    * shingling/dedup/BPE/token counts become CJK-safe by substituting
    * this column for the raw text. Pure codegen'd expressions; one O(L)
    * pass per stage, no shuffle.
    */
  def uSegment(text: Column): Column =
    regexp_replace(
      regexp_replace(normalized(text), "\\p{Z}+", " "),
      "(" + CjkClass + ")", " $1 ")

  /** Codepoint-aware tokenization: [[uSegment]] then whitespace split —
    * Latin/Cyrillic/etc. words stay whole, CJK text yields one token per
    * codepoint (the unigram convention for unsegmented scripts).
    */
  def uwords(text: Column): Column = words(uSegment(text))

  /** Distinct character n-grams of `text`; empty array when shorter than n. */
  def charNgrams(text: Column, n: Int): Column =
    when(
      length(text) >= n,
      array_distinct(transform(sequence(lit(0), length(text) - n), i => text.substr(i + 1, lit(n)))),
    ).otherwise(array().cast("array<string>"))

  /** Space-joined word k-shingles; empty array when fewer than k words.
    *
    * CAUTION: the inner lambda references `words` (a regex split of the
    * whole document), which interpreted HOF eval re-computes once per
    * shingle position — O(L^2) per row. Fine for short strings or one-off
    * use; for corpus-scale shingling use
    * [[graft.operators.Shingles.shingleRows]] instead.
    */
  def wordShingles(text: Column, k: Int): Column = {
    val w = words(text)
    when(
      size(w) >= k,
      transform(sequence(lit(0), size(w) - k), i => concat_ws(" ", slice(w, i + 1, lit(k)))),
    ).otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two pre-deduplicated arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val common = size(array_intersect(a, b))
    common.cast("double") / (size(a) + size(b) - common)
  }
}
