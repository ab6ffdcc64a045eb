package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Column-level text primitives are public library surface a user
  * composes with directly — exercised here on edge cases (the corpus
  * operators exercise the happy paths at scale).
  */
class FunctionsSpec extends SparkSpec {

  private def one(expr: org.apache.spark.sql.Column) = {
    import spark.implicits._
    Seq("the quick brown fox").toDF("text").select(expr.as("r")).collect()(0)
  }

  test("charNgrams: distinct n-grams, empty below n chars") {
    val r = one(TextFunctions.charNgrams(col("text"), 4)).getSeq[String](0)
    assert(r.contains("quic") && r.contains("k br"))
    assert(r.distinct.length == r.length)
    val short = one(when(length(col("text")) > 100, lit(null))
      .otherwise(TextFunctions.charNgrams(lit("ab"), 4))).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("wordShingles: space-joined k-shingles, empty below k words") {
    val r = one(TextFunctions.wordShingles(col("text"), 3)).getSeq[String](0)
    assert(r == Seq("the quick brown", "quick brown fox"))
    assert(one(TextFunctions.wordShingles(lit("one two"), 3)).getSeq[String](0).isEmpty)
  }

  test("jaccard: exact overlap ratio on deduplicated arrays") {
    val j = one(TextFunctions.jaccard(
      array(lit("a"), lit("b"), lit("c")),
      array(lit("b"), lit("c"), lit("d")))).getDouble(0)
    assert(j == 0.5)
  }

  test("words: trims before splitting") {
    val r = one(TextFunctions.words(lit("  a b  "))).getSeq[String](0)
    assert(r == Seq("a", "b"))
  }
}
