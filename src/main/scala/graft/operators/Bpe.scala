package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One word of the BPE working vocabulary: corpus count + current symbol
  * segmentation (starts as characters, coarsens as merges apply).
  */
case class BpeWord(word: String, wn: Long, syms: Seq[String])

/** Distributed byte-pair-encoding vocabulary learning (Sennrich et al.
  * 2016, the standard subword-tokenizer trainer).
  *
  * The Spark-first structure: all statistics fold over the WORD-COUNT
  * table (vocabulary-sized — ~alphabet² pair space, never corpus-sized),
  * which is itself one map-side-combined groupBy over the corpus scan.
  * Each merge round is (1) an adjacent-pair aggregate weighted by word
  * count, (2) a deterministic argmax (count desc, pair asc) — a 1-row
  * collect, the only driver traffic per round — and (3) a distributed
  * left-to-right merge pass over the segmentations (typed map: the
  * non-overlapping fold is genuinely imperative, and the table it runs
  * over is vocabulary-sized). At 100 TB the corpus is touched exactly
  * once (the word count); every iteration after that is O(vocab).
  */
object Bpe {

  /** Corpus word counts — the only corpus-wide pass. With `unicode = true`
    * the text is NFC-normalized and CJK-segmented first
    * ([[graft.functions.TextFunctions.uSegment]]): BPE then learns over
    * per-codepoint CJK units and byte-stable accents instead of silently
    * treating every NFC/NFD spelling as a distinct word.
    */
  def wordCounts(spark: SparkSession, dir: String, unicode: Boolean = false): DataFrame = {
    val text =
      if (unicode) graft.functions.TextFunctions.uSegment(col("text")) else col("text")
    Tables
      .documents(spark, dir)
      .select(explode(split(trim(text), "\\s+")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("wn"))
  }

  /** t09: round-one adjacent character-pair frequencies (the statistic
    * the first BPE merge maximizes), top `k` with deterministic ranking.
    * The global window ranks the PAIR table — bounded by alphabet², not
    * the corpus — so the unpartitioned sort is over a structurally tiny
    * input at any scale.
    */
  def pairStats(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val pairs = wordCounts(spark, dir)
      .filter(length(col("word")) >= 2) // sequence(1, 0) would run DESCENDING in Spark
      .select(col("wn"),
        explode(expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(sum("wn").as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("pair"))
    pairs.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** One non-overlapping left-to-right merge pass (the standard BPE
    * apply rule: "aaa" under merge (a,a) → ["aa","a"]).
    */
  def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Segment every document with a learned merge list — the inference
    * side of the trainer. Merges apply in rank order per word (the BPE
    * contract), via one typed map over the DISTINCT-word table, then a
    * broadcast join back onto the corpus scan: segmentation work is
    * O(vocab × merges), never O(corpus × merges), and the corpus pass
    * stays a narrow join + aggregate.
    */
  def tokenize(spark: SparkSession, dir: String, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val segmented = wordCounts(spark, dir)
      .select("word")
      .as[String]
      .map { w =>
        val syms = merges.foldLeft(w.map(_.toString): Seq[String]) {
          case (s, (a, b)) => mergeOnce(s, a, b)
        }
        (w, syms)
      }
      .toDF("word", "toks")
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .join(broadcast(segmented), Seq("word"))
      .groupBy("doc_id")
      .agg(
        sum(size(col("toks"))).as("n_tokens"),
        count(lit(1)).as("n_words"),
      )
  }

  /** Learn `numMerges` merges over the corpus. Ties break (count desc,
    * pair lexicographic) so the learned vocabulary is deterministic on
    * any cluster layout; merging stops early when no pair occurs twice.
    */
  def trainMerges(spark: SparkSession, dir: String, numMerges: Int): Seq[(String, String)] = {
    import spark.implicits._
    var vocab: Dataset[BpeWord] = wordCounts(spark, dir)
      .as[(String, Long)]
      .map { case (w, n) => BpeWord(w, n, w.map(_.toString)) }
      .persist()
    vocab.count()
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < numMerges) {
      val top = vocab
        .toDF()
        .filter(size(col("syms")) >= 2)
        .select(col("wn"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("wn").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < 2) done = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += ((a, b))
        val prev = vocab
        vocab = vocab.map(v => v.copy(syms = mergeOnce(v.syms, a, b))).persist()
        vocab.count()
        prev.unpersist()
      }
    }
    vocab.unpersist()
    merges.toList
  }
}
