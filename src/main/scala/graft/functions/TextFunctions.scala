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
