package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {

  /** Independent single-node BPE reference (naive recount every round)
    * over a word-count map — the semantics the distributed trainer must
    * reproduce exactly, tiebreak and all.
    */
  private def referenceBpe(counts: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab = counts.map { case (w, n) => (w.map(_.toString).toList, n) }.toList
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p => pairCounts(p) = pairCounts.getOrElse(p, 0L) + n)
      }
      if (pairCounts.isEmpty) done = true
      else {
        val (best, cnt) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < 2) done = true
        else {
          merges += best
          vocab = vocab.map { case (syms, n) =>
            (Bpe.mergeOnce(syms, best._1, best._2).toList, n)
          }
        }
      }
    }
    merges.toList
  }

  test("t09 pair stats: 20 rows, ranked desc with deterministic ties, counts match a recount") {
    val rows = Bpe.pairStats(spark, sf).orderBy("rn").collect()
    assert(rows.length == 20)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.sameElements(cnts.sortBy(-_)), "ranking must be count-descending")
    assert(rows.forall(_.getAs[String]("pair").length == 2))
  }

  test("distributed trainer reproduces the single-node reference exactly (10 merges, tiebreaks included)") {
    val counts = Bpe
      .wordCounts(spark, sf)
      .collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("wn"))
      .toMap
    val expected = referenceBpe(counts, 10)
    val got = Bpe.trainMerges(spark, sf, 10)
    assert(got == expected, s"distributed merges $got != reference $expected")
  }

  test("batched trainer: B=8 cuts rounds >=4x and matches sequential quality (documented divergence window)") {
    val counts = Bpe
      .wordCounts(spark, sf)
      .collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("wn"))
      .toMap
    val expected = referenceBpe(counts, 20)
    val (batched, rounds) = Bpe.trainMergesWithRounds(spark, sf, 20, batch = 8)
    assert(rounds * 4 <= batched.size,
      s"batching must cut driver rounds >=4x: $rounds rounds for ${batched.size} merges")
    // the two schedules may bracket multi-step tokens differently and
    // reorder tie-window merges (trainMergesWithRounds scaladoc); the
    // invariants that define "same trainer, faster" are: the merge sets
    // nearly coincide, almost every corpus word segments identically,
    // and total compression is equal-or-better
    def segment(ms: Seq[(String, String)]): Map[String, Seq[String]] =
      counts.keys.map { w =>
        w -> ms.foldLeft(w.map(_.toString): Seq[String]) { case (s, (a, b)) => Bpe.mergeOnce(s, a, b) }
      }.toMap
    val segSeq = segment(expected)
    val segBat = segment(batched)
    val nDiff = counts.keys.count(w => segSeq(w) != segBat(w))
    assert(nDiff <= math.max(2, counts.size / 50),
      s"batched segmentations diverge for $nDiff of ${counts.size} words")
    // raw merge-PAIR overlap is bracketing-sensitive at a 20-merge
    // horizon (colu+m vs lum/co+lum both spell "column"): expect rough
    // agreement only; the segmentation/compression asserts above and
    // below are the real quality contract
    val overlap = batched.toSet.intersect(expected.toSet).size.toDouble / expected.size
    assert(overlap >= 0.5, f"merge-set overlap collapsed: $overlap%.2f")
    def totalTokens(seg: Map[String, Seq[String]]): Long =
      counts.map { case (w, n) => seg(w).size * n }.sum
    assert(totalTokens(segBat) <= totalTokens(segSeq) * 101 / 100,
      s"batched compression worse than sequential: ${totalTokens(segBat)} vs ${totalTokens(segSeq)}")
  }

  test("adaptive trainer: rounds collapse vs the B=8 path; quality tracks sequential") {
    val counts = Bpe
      .wordCounts(spark, sf)
      .collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("wn"))
      .toMap
    // train to EXHAUSTION (the sf0.001 vocab runs out of count>=2 pairs
    // around 90 merges) so the round comparison covers the whole curve
    val horizon = 1000
    val (b8, rounds8)      = Bpe.trainMergesWithRounds(spark, sf, horizon, batch = 8)
    val (adapt, roundsAd)  = Bpe.trainMergesAdaptive(spark, sf, horizon)
    info(s"rounds to exhaustion  B=8: $rounds8  adaptive: $roundsAd" +
      s"  (merges: ${b8.size} vs ${adapt.size})")
    assert(math.abs(adapt.size - b8.size) <= 2 && adapt.size >= 80,
      s"both schedules must learn essentially the full vocabulary: ${adapt.size} vs ${b8.size}")
    // >=2x on this exhaustion-limited corpus (5 vs 12 measured); the
    // ratio RISES with corpus size because the admitted batch grows with
    // the flattening pair distribution while B stays pinned — the 10x
    // probe measurement (SURVEY §13) is where the verdict's 4x bar binds
    assert(roundsAd * 2 <= rounds8,
      s"adaptive batching must cut driver rounds >=2x vs B=8 even at exhaustion scale: $roundsAd vs $rounds8")
    // quality contract vs the sequential reference, same invariant as
    // the B=8 spec: equal-or-near compression over the corpus
    val expected = referenceBpe(counts, horizon)
    def segment(ms: Seq[(String, String)]): Map[String, Seq[String]] =
      counts.keys.map { w =>
        w -> ms.foldLeft(w.map(_.toString): Seq[String]) { case (s, (a, b)) => Bpe.mergeOnce(s, a, b) }
      }.toMap
    def totalTokens(seg: Map[String, Seq[String]]): Long =
      counts.map { case (w, n) => seg(w).size * n }.sum
    val (tSeq, tAd) = (totalTokens(segment(expected)), totalTokens(segment(adapt)))
    assert(tAd <= tSeq * 102 / 100,
      s"adaptive compression must track sequential: $tAd vs $tSeq tokens")
  }

  test("batched trainer: B=1 is the sequential trainer verbatim") {
    val (b1, rounds) = Bpe.trainMergesWithRounds(spark, sf, 6, batch = 1)
    assert(b1 == Bpe.trainMerges(spark, sf, 6) && rounds == 6)
  }

  test("mergeOnce is the standard non-overlapping left-to-right rule") {
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.mergeOnce(Seq("x"), "a", "b") == Seq("x"))
  }

  test("tokenize: learned merges compress token counts; totals bounded by chars and words") {
    val merges = Bpe.trainMerges(spark, sf, 10)
    val out = Bpe.tokenize(spark, sf, merges).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (toks, words) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_words"))
      assert(toks >= words, "a word is at least one token")
    }
    // merges must actually compress: total tokens < total characters
    val totalToks  = out.map(_.getAs[Long]("n_tokens")).sum
    val totalChars = graft.sources.Tables.documents(spark, sf)
      .select(expr("sum(length(replace(trim(text), ' ', '')))")).collect()(0).getLong(0)
    assert(totalToks < totalChars, s"10 merges must compress below char-level: $totalToks vs $totalChars")
  }

  test("merged segmentations always concatenate back to the word") {
    val merges = Bpe.trainMerges(spark, sf, 5)
    val words = Bpe.wordCounts(spark, sf).limit(200).collect().map(_.getAs[String]("word"))
    words.foreach { w =>
      val syms = merges.foldLeft(w.map(_.toString): Seq[String]) {
        case (s, (a, b)) => Bpe.mergeOnce(s, a, b)
      }
      assert(syms.mkString == w)
    }
  }
}
