package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text analysis for training-data pipelines (SURVEY.md §2.4, t01-t04):
  * language ID, quality scoring, token counting, fingerprinting. All pure
  * column expressions — per-document, embarrassingly parallel, no shuffle.
  */
object TextAnalysis {

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un"),
  )

  /** t13: the Gopher word-level quality rules (Rae et al. 2021 —
    * "Scaling Language Models", appendix A1.1; the public filter set
    * most production corpora start from), applied with the published
    * thresholds: 50 ≤ words ≤ 100 000; mean word length in [3, 10];
    * symbol-to-word ratio (# and …) ≤ 0.1; ≥ 80% of words contain an
    * alphabetic character; ≥ 2 hits from the canonical stopword set.
    * (The line-shape rules — bullet/ellipsis line fractions — need
    * multi-line documents and are omitted for this corpus.)
    *
    * Pure scan projection (higher-order `filter` over the word array,
    * no explode, no shuffle); ratio comparisons happen on identical
    * integer-derived doubles on both engines, so the verdict column is
    * engine-exact, not approximately so.
    */
  def gopherQuality(spark: SparkSession, dir: String): DataFrame = {
    val ws      = words(col("text"))
    val nWords  = size(ws)
    val meanLen = length(regexp_replace(col("text"), "\\s", "")).cast("double") / nWords
    val symbols = size(regexp_extract_all(col("text"), lit("#|\\.\\.\\."), lit(0)))
    val alphaW  = size(filter(ws, w => w.rlike("[a-zA-Z]")))
    val stops   = size(filter(ws, w => w.rlike("^(the|be|to|of|and|that|have|with)$")))
    val symR    = symbols.cast("double") / nWords
    val alphaF  = alphaW.cast("double") / nWords
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        nWords.cast("long").as("n_words"),
        round(meanLen, 4).as("mean_word_len"),
        round(symR, 6).as("symbol_ratio"),
        round(alphaF, 6).as("alpha_word_frac"),
        stops.cast("long").as("n_stopwords"),
        (nWords.geq(50) && nWords.leq(100000) &&
          meanLen.geq(3.0) && meanLen.leq(10.0) &&
          symR.leq(0.1) && alphaF.geq(0.8) && stops.geq(2))
          .cast("int").as("passes_gopher"),
      )
  }

  /** t01: language ID via stopword-hit counts with a deterministic
    * priority order; 'und' when no list scores a hit. Checked rows-only
    * (the heuristic is ours, not SQL-standard).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val w = words(lower(col("text")))
    val scored = stopwords.toSeq.sortBy(_._1).foldLeft(Tables.documents(spark, dir)) {
      case (df, (langName, stops)) =>
        df.withColumn(s"score_$langName", size(filter(w, t => t.isin(stops: _*))).cast("long"))
    }
    val langs  = stopwords.keys.toSeq.sorted
    val best   = greatest(langs.map(l => col(s"score_$l")): _*)
    val pred   = langs
      .foldRight(lit("und")) { (l, elseCol) => when(col(s"score_$l") === best && best > 0, l).otherwise(elseCol) }
    scored.select(col("doc_id") +: col("lang").as("declared_lang") +: pred.as("pred_lang") +:
      langs.map(l => col(s"score_$l")): _*)
  }

  /** t11: language-ID agreement matrix — predicted (t01 heuristic) versus
    * declared language, with within-declared shares: the QC table that
    * tells you whether a corpus's metadata can be trusted before routing
    * per-language pipelines by it. The matrix is (langs+1)² rows at any
    * corpus size; totals broadcast back over it.
    */
  def langAgreement(spark: SparkSession, dir: String): DataFrame = {
    val cells = langId(spark, dir)
      .groupBy("declared_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("declared_lang").agg(sum("n").as("tot"))
    cells
      .join(broadcast(totals), Seq("declared_lang"))
      .select(col("declared_lang"), col("pred_lang"), col("n"),
        round(col("n").cast("double") / col("tot"), 4).as("share"))
  }

  /** t02: quality scoring — alphabetic/space ratios and average word
    * length (oracle-checked; all ratios are exact-int / exact-int).
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val t        = col("text")
    val alphaLen = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
    val spaceLen = (length(t) - length(regexp_replace(t, " ", ""))).cast("double")
    val noWs     = length(regexp_replace(t, "\\s", "")).cast("double")
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        round(alphaLen / length(t), 4).as("alpha_ratio"),
        round(spaceLen / length(t), 4).as("space_ratio"),
        round(noWs / size(words(t)), 4).as("avg_word_len"),
        length(t).cast("long").as("len_chars"),
      )
  }

  /** t03: token counting — whitespace tokens and a BPE-ish regex token
    * count (letters-run | digits-run | single symbol), oracle-checked.
    */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(words(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast("long")
          .as("bpe_tokens"),
      )

  /** t05: unigram log-probability quality score — average log10 corpus
    * frequency of the document's words (low = rare/garbled text). Two
    * passes over the exploded words: corpus frequencies, then a broadcast
    * join back. Counts are exact integers, so the only FP is the final
    * log/divide — identical operands on both engines.
    */
  def unigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val docWords = Tables
      .documents(spark, dir)
      .select(col("doc_id"), explode(words(lower(col("text")))).as("w"))
    val freqs  = docWords.groupBy("w").agg(count(lit(1)).as("wc"))
    // Corpus total = sum of the word counts already in `freqs` — exact, and
    // spares a third full scan+explode of the documents.
    val totals = freqs.agg(sum("wc").cast("double").as("total"))
    docWords
      .join(broadcast(freqs), Seq("w"))
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(round(avg(log10(col("wc") / col("total"))), 4).as("avg_logprob"), count(lit(1)).as("n_words"))
  }

  /** t04: document fingerprint — the lexicographic minimum of md5 over all
    * word 5-shingles (a 1-permutation MinHash; robust to reordering edits).
    * Oracle-checked: md5 hex is engine-independent. Shingling goes through
    * the explode-and-window path ([[Shingles]]); docs with fewer than 5
    * words keep a null fingerprint via the left join.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .join(Shingles.md5MinFingerprint(Tables.documents(spark, dir), 5), Seq("doc_id"), "left")

  /** t06: repetition scoring — per-document word-histogram statistics
    * (distinct-word fraction, top-word share). High top-word share or a
    * collapsed distinct fraction is the classic signature of degenerate
    * model-generated or template text, a standard pre-training filter.
    * Shape: explode -> groupBy(doc, word) -> groupBy(doc) — both
    * aggregates map-side combine, so what shuffles is the per-doc word
    * HISTOGRAM (bounded by vocabulary), not the corpus's word instances.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(
        sum("n").as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max("n").as("top_word_n"),
      )
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_distinct_words"),
        col("top_word_n"),
        round(col("top_word_n") / col("n_words").cast("double"), 4).as("top_word_ratio"),
        round(lit(1.0) - col("n_distinct_words") / col("n_words").cast("double"), 4).as("dup_ratio"),
      )

  /** t08: TF-IDF top-k terms per document — the classic keyword/topic
    * signal for corpus curation (a doc whose top terms are boilerplate
    * tokens is template text; distinctive top terms mark topical
    * content). `score = tf * ln(N / df)`; ties break by term so
    * selection is engine-deterministic. Shuffle shape: per-doc term
    * counts and the document-frequency table both map-side combine; the
    * df table is vocabulary-sized and broadcast back (same web-scale
    * swap note as t05); the only window sorts each doc's own terms.
    */
  def tfidf(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(words(lower(col("text")))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df")) // tf rows are distinct (doc, term)
    val w  = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), round(col("score"), 4).as("score"), col("rn"))
  }

  /** t07: bigram log-probability — [[unigramLogprob]] lifted to word
    * bigrams (a sharper fluency score: scrambled text keeps its unigram
    * distribution but loses its bigrams). Bigrams come from the native
    * shingle kernel, so the corpus-frequency model is built from a
    * shuffle-free scan projection; the frequency table is broadcast back
    * (vocabulary-sized — at web scale swap for a shuffle join, same note
    * as t05).
    */
  def bigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val docBigrams = Shingles
      .shingleRows(Tables.documents(spark, dir).withColumn("text", lower(col("text"))), 2)
      .select(col("doc_id"), col("shingle").as("b"))
    val freqs  = docBigrams.groupBy("b").agg(count(lit(1)).as("bc"))
    val totals = freqs.agg(sum("bc").cast("double").as("total"))
    docBigrams
      .join(broadcast(freqs), Seq("b"))
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(round(avg(log10(col("bc") / col("total"))), 4).as("avg_logprob"), count(lit(1)).as("n_bigrams"))
  }

  /** The six mixed-script suffixes t12 plants (deterministically by
    * doc_id) to exercise the Unicode path on the ASCII test corpus: Han +
    * Hiragana, composed accents, the SAME accents decomposed (NFD — rows
    * 2 and 3 must hash identically after normalization), Hangul,
    * Katakana/Hiragana, and fullwidth compatibility forms.
    */
  private[graft] val mixedScriptVariants: Seq[String] = Seq(
    "漢字処理は難しい",
    "café résumé",
    "café résumé",
    "한국어 텍스트 분석",
    "カタカナとひらがな混在",
    "ｆｕｌｌｗｉｄｔｈ１２３ test",
  )

  /** t12: Unicode/CJK-robust tokenization over a mixed-script corpus —
    * the r4 verdict's top gap made measurable. Each document gets a
    * deterministic mixed-script suffix (see [[mixedScriptVariants]]);
    * the query reports codepoint-aware token counts (NFC + Unicode-space
    * folding + per-codepoint CJK segmentation via
    * [[graft.functions.TextFunctions.uwords]]), the CJK codepoint count,
    * the md5 of the NFC-normalized text (NFD and NFC spellings of the
    * same text MUST collide here — that is the dedup-stability property),
    * and the naive whitespace count for contrast (CJK runs collapse to 1
    * there). All per-row projections; oracle replays every stage in
    * DuckDB (nfc_normalize + RE2).
    */
  def unicodeTokens(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{uwords, words, normalized, CjkClass}
    val variants = array(mixedScriptVariants.map(lit): _*)
    val t2 = concat(col("text"), lit(" "),
      element_at(variants, (pmod(col("doc_id"), lit(6)) + 1).cast("int")))
    val nt = normalized(t2)
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(uwords(t2)).cast("long").as("n_utokens"),
        size(regexp_extract_all(nt, lit(CjkClass), lit(0))).cast("long").as("n_cjk"),
        md5(nt).as("norm_hash"),
        size(words(t2)).cast("long").as("n_ws_tokens"),
      )
  }

  /** t14: per-language SEQUENCE-LENGTH histogram — the token-count
    * distribution every training-data report opens with (and what
    * packing/truncation decisions read): whitespace tokens bucketed in
    * 64-token bands, capped at band 15, counted and summed per
    * (lang, band). One scan projection + one map-side-combined groupBy;
    * output cardinality is langs × 16 at any corpus size.
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val t = size(words(col("text"))).cast("long")
    Tables
      .documents(spark, dir)
      .select(col("lang"), least(floor(t / 64L), lit(15L)).cast("long").as("band"), t.as("t"))
      .groupBy("lang", "band")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("total_tokens"))
  }

  /** t15: BM25 ranked retrieval (Robertson–Spärck Jones; k1 = 1.2,
    * b = 0.75, the +1-smoothed IDF) — the retrieval scorer a curation /
    * RAG pipeline runs against the corpus. Scan-shaped at any corpus
    * size: one tokenize pass feeds (a) per-doc lengths (map-side
    * combine), (b) per-(doc, query-term) term frequencies — the
    * `isin(queryTerms)` filter reaches the scan, so the wide state is
    * only docs × |Q| — and (c) the tiny per-term document frequencies
    * and the 1-row corpus stats, both BROADCAST into the scoring join
    * (no shuffle on the big side beyond the tf groupBy). Top-k by
    * (score DESC, doc_id) — the deterministic cut.
    */
  def bm25Rank(spark: SparkSession, dir: String,
      queryTerms: Seq[String] = Seq("spark", "vector", "stream"), k: Int = 10): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
    val dl    = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
    val tf    = toks.filter(col("tok").isin(queryTerms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfT   = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val avgdl = col("tot_dl").cast("double") / col("n_docs")
    val idf   = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score = idf * col("tf") * (lit(1.0) + k1) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    tf.join(dl, Seq("doc_id"))
      .join(broadcast(dfT), Seq("tok"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(score), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** t16: lexical-diversity stats per source — type-token ratio and
    * hapax-legomena rate, the classic text-quality signals (a spammy or
    * template-generated source shows low TTR and low hapax share).
    * Exact integer arithmetic end to end: two map-side-combined
    * aggregations over one tokenize pass, output one row per source.
    */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"),
      )
      .select(
        col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
      )

  /** t17: per-source distribution drift — KL(source ‖ corpus) over the
    * unigram distribution, the diagnostic a mixture-weighting pass reads
    * before trusting per-source token counts (a source whose unigram LM
    * sits far from the corpus either carries novel content worth
    * upweighting or template spam worth capping; t16's TTR disambiguates).
    *
    * Same exact-integer discipline as q91: the per-term log-ratio
    * ln((n_st·N)/(N_s·n_t)) is rounded ONCE to integer micro-nats, and
    * the reported figure is the integer Σ_t n_st·k_unats(t) — i.e.
    * KL·N_s·1e6 — so the cross-engine compare is an integer equality,
    * never a float-sum race. All products stay < 2^53 (exact in
    * doubles) at any corpus this vocab shape reaches; true KL in nats =
    * kl_unats_scaled / (1e6 · n_tokens).
    *
    * Shape: one token scan → (source, tok) counts (map-side combine);
    * term totals re-aggregate FROM those counts (vocab-sized, not
    * corpus-sized) and join back on the tok key UNHINTED — a real web
    * corpus's unigram vocab is too big to force-broadcast, and both
    * sides are already tok-keyed aggregates (AQE broadcasts when small).
    * Only the sources-sized and 1-row tables carry broadcast hints.
    * Output is one row per source at any scale.
    */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(spark, dir)
      .select(col("source"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("n_st"))
    val srcTot  = st.groupBy("source").agg(sum("n_st").as("n_s"))
    val termTot = st.groupBy("tok").agg(sum("n_st").as("n_t"))
    val corpTot = termTot.agg(sum("n_t").as("n"))
    st
      .join(termTot, Seq("tok"))
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(corpTot))
      .select(col("source"), col("n_s"),
        // each factor casts to double BEFORE the multiply: n_st·n as a
        // Long product wraps silently past 2^63 (Spark) while DuckDB's
        // HUGEINT arithmetic doesn't — the same expression would then
        // diverge quietly at corpus scale. Double mul/div is the same
        // IEEE op in both engines, so parity survives any scale.
        (col("n_st") *
          round(lit(1e6) * log(
            (col("n_st").cast("double") * col("n").cast("double")) /
            (col("n_s").cast("double") * col("n_t").cast("double")))).cast("long")).as("c"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"), sum("c").as("kl_unats_scaled"))
  }

  /** t18: VOCABULARY-GROWTH curve (the Heaps'-law table) — cumulative
    * distinct types vs cumulative tokens at `buckets` corpus checkpoints,
    * the saturation plot that sizes a tokenizer vocabulary and tells a
    * crawl whether new data still brings new language. "Order" is the
    * deterministic doc_id order, bucketed so the output is `buckets`
    * rows at ANY corpus size.
    *
    * Scale shape — no sort, no per-token window: a type's contribution
    * to the curve is fully determined by its FIRST-occurrence doc
    * (min(doc_id) per term, one map-side-combined aggregate over the
    * token scan); banding those first occurrences and the per-band
    * token/doc counts are two more combine-friendly aggregates, and the
    * running sums run over the `buckets`-row result (a single-partition
    * window over ~10 rows, not over the corpus). Exact integers end to
    * end.
    */
  def vocabularyGrowth(spark: SparkSession, dir: String, buckets: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val mx   = docs.agg(max("doc_id").as("mx"))
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
    def bandOf(c: org.apache.spark.sql.Column) =
      least(expr(s"CAST(${c.toString} * $buckets DIV (mx + 1) AS BIGINT)"), lit(buckets - 1L))
    // tokens and docs per band
    val docBands = docs.crossJoin(broadcast(mx))
      .select(bandOf(col("doc_id")).as("band"))
      .groupBy("band").agg(count(lit(1)).as("n_docs"))
    val tokBands = toks.crossJoin(broadcast(mx))
      .select(bandOf(col("doc_id")).as("band"))
      .groupBy("band").agg(count(lit(1)).as("n_tokens"))
    // a type is NEW in the band of its first occurrence
    val typeBands = toks.groupBy("tok").agg(min("doc_id").as("fd"))
      .crossJoin(broadcast(mx))
      .select(bandOf(col("fd")).as("band"))
      .groupBy("band").agg(count(lit(1)).as("new_types"))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy("band").rowsBetween(W.unboundedPreceding, W.currentRow)
    docBands
      .join(tokBands, Seq("band"), "full_outer")
      .join(typeBands, Seq("band"), "full_outer")
      .select(col("band"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .select(col("band"),
        sum("n_docs").over(w).as("docs_cum"),
        sum("n_tokens").over(w).as("tokens_cum"),
        sum("new_types").over(w).as("types_cum"))
  }
  /** t19: PII detection + redaction — the scrubbing pass every training
    * corpus runs before release. The synthetic corpus carries no real
    * PII, so deterministic contact strings are INJECTED first (keyed on
    * doc_id so both engines derive the identical document), then the
    * three standard pattern classes are counted and redacted: emails,
    * NANP-style phone numbers, dotted-quad IPs. Patterns use the
    * lookaround-free common subset of Java regex and RE2 so Spark and
    * the DuckDB oracle match the same spans. Pure scan projection
    * (regexp_count/regexp_replace are codegen'd) + one map-side-combined
    * aggregate per source; at 100 TB this is the cheapest possible
    * shape — one pass, no shuffle beyond the per-source combine.
    */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phone = "\\+1-[0-9]{3}-[0-9]{4}"
    val ip    = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val injected = concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
      // moduli 3/11/7 — all coprime with the corpus's 20-way source
      // striping (source = doc_id % 20), so every source sees a mix;
      // 5 would give whole sources all-or-none phones
      when(col("doc_id") % 11 === 0,
        concat(lit(" call +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0.1")))
        .otherwise(lit("")),
    )
    val redacted = regexp_replace(
      regexp_replace(regexp_replace(injected, email, "<EMAIL>"), phone, "<PHONE>"),
      ip, "<IP>")
    Tables
      .documents(spark, dir)
      .select(
        col("source"),
        regexp_count(injected, lit(email)).as("em"),
        regexp_count(injected, lit(phone)).as("ph"),
        regexp_count(injected, lit(ip)).as("ipc"),
        length(redacted).as("redlen"),
      )
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("em").as("n_emails"),
        sum("ph").as("n_phones"),
        sum("ipc").as("n_ips"),
        sum(when(col("em") + col("ph") + col("ipc") > 0, 1L).otherwise(0L)).as("n_docs_with_pii"),
        sum("redlen").as("redacted_chars"),
      )
  }

  /** t20: readability scoring — Flesch reading ease per source, the
    * classic corpus-quality signal alongside t02/t13 (machine-generated
    * and OCR-damaged text score far outside the human band). The three
    * counting primitives are the cheap public approximations: words =
    * whitespace tokens (the t03/q94 convention), sentences = runs of
    * terminal punctuation `[.!?]+` (floored at 1 so fragments divide
    * safely), syllables = vowel-group runs `[aeiouy]+` of the
    * lowercased text (group counting commutes with word splitting —
    * whitespace breaks any run — so one document-level regexp_count
    * replaces a per-word pass). One scan, map-side-combined integer
    * sums; the Flesch value itself is computed on the AGGREGATE ratios
    * in exact integer micro-units (two integer DIVs both engines
    * evaluate identically — no float crosses rows, so the hash compare
    * is exact): flesch_micro = 1e6·(206.835 − 1.015·words/sentences −
    * 84.6·syllables/words), within 1e-3 of the real-valued figure.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("w"),
        greatest(lit(1L), regexp_count(col("text"), lit("[.!?]+")).cast("long")).as("s"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("y"),
      )
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("w").as("words"),
        sum("s").as("sentences"),
        sum("y").as("syllables"),
      )
      .select(
        col("source"), col("n_docs"), col("words"), col("sentences"), col("syllables"),
        expr("206835000 - (1015 * (words * 1000000 div sentences)) div 1000" +
          " - (84600 * (syllables * 1000000 div words)) div 1000").as("flesch_micro"),
      )

  /** t22: per-source ZIPF rank-frequency slope — the corpus-health law
    * check (natural text runs slope ≈ −1 on log freq vs log rank;
    * boilerplate-heavy or template-generated sources flatten or steepen
    * it). Least-squares slope over the top-`k` terms per source, with
    * every float rounded PER ROW into integer micro-units (x = ⌊1e6·ln
    * rank⌉, y = ⌊1e6·ln freq⌉ — the t17 discipline) and the normal
    * equations folded in DECIMAL(38,0): sums, the n·Σxy−ΣxΣy cross
    * terms, and the final micro-slope DIV are all exact integer
    * arithmetic, so no accumulation order can leak into the hash.
    * Emitted as the POSITIVE `zipf_neg_slope_micro` (the slope is
    * negative; keeping the DIV operands positive sidesteps the
    * truncate-vs-floor divergence between engines on negatives).
    *
    * Scale shape: one token scan → map-side-combined (source, term)
    * counts; ranking is a per-source window over the vocabulary
    * (bounded by the largest source's vocab, sharded by source); the
    * regression folds over k rows per source.
    */
  def zipfSlope(spark: SparkSession, dir: String, k: Int = 1000): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("n").desc, col("term"))
    val ranked = Tables.documents(spark, dir)
      .select(col("source"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("source", "term")
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"),
        round(lit(1e6) * log(col("rank").cast("double"))).cast("decimal(38,0)").as("x"),
        round(lit(1e6) * log(col("n").cast("double"))).cast("decimal(38,0)").as("y"))
    ranked
      .groupBy("source")
      .agg(count(lit(1)).cast("decimal(38,0)").as("m"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("m").cast("long").as("n_terms"),
        expr("CAST((sx * sy - m * sxy) * 1000000 DIV (m * sxx - sx * sx) AS BIGINT)")
          .as("zipf_neg_slope_micro"))
  }

  /** t23: CCNet-style per-language fluency buckets (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): rank every document by its LM score WITHIN its language and
    * cut the distribution into head / middle / tail terciles — the
    * bucketing CCNet uses so a quality threshold never compares scores
    * across languages (an unconditionally-applied global cutoff throws
    * away whole low-resource languages). The LM here is the t05 unigram
    * corpus model; per-word log10-probs are rounded to integer
    * micro-units PER ROW (the t17 fixed point) so each document's score
    * is an exact integer on both engines, and the tercile order key is
    * that integer sum divided by the word count (one IEEE division of
    * exact integers — deterministic), ties broken by doc_id.
    *
    * Scale shape: two passes over the exploded words (corpus freqs,
    * then a broadcast join back — t05's shape), a per-doc combine, and
    * ONE per-language sort for ntile. The per-language sort is inherent
    * to exact terciles; at 100 TB you would swap ntile for thresholds
    * from approx quantiles (q19's sketch) and keep everything else.
    * Output is bucket-level (lang × tercile counts + exact integer
    * score/token sums), the shape a mixture-planning step consumes.
    */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docWords = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(words(lower(col("text")))).as("w"))
    val freqs  = docWords.groupBy("w").agg(count(lit(1)).as("wc"))
    val totals = freqs.agg(sum("wc").cast("double").as("total"))
    val perDoc = docWords
      .join(broadcast(freqs), Seq("w"))
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        sum(round(lit(1e6) * log10(col("wc") / col("total"))).cast("long")).as("lp_micro"),
        count(lit(1)).as("nw"))
    val byFluency = Window
      .partitionBy("lang")
      .orderBy((col("lp_micro").cast("double") / col("nw")).desc, col("doc_id"))
    perDoc
      .withColumn("b", ntile(3).over(byFluency))
      .groupBy(
        col("lang"),
        when(col("b") === 1, "head").when(col("b") === 2, "middle").otherwise("tail").as("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("lp_micro").as("lp_micro_sum"),
        sum("nw").as("n_words"))
  }

  /** t24: duplicate n-gram fraction (Rae et al. 2021, Gopher A1.1's
    * repetition family) — the WITHIN-document redundancy signal t06's
    * word histogram can't see: a doc that repeats whole phrases has a
    * high fraction of 3-gram INSTANCES whose trigram occurs more than
    * once in that document, even when its word-level distinct ratio
    * looks healthy. Per source: docs, exact gram-instance totals, and
    * how many docs cross the Gopher-style 20% line (integer
    * cross-multiply `dup·5 > total` — no ratio crosses the hash).
    *
    * Scale shape: trigrams come from the native `graft_shingles` kernel
    * (one O(L) map-side pass on the scan — no per-position regex
    * re-split, no word shuffle), the in-doc frequency count and the
    * per-doc fold are both keyed by doc_id (the natural partition), and
    * the source rollup is over one row per doc. Docs under 3 words emit
    * no grams and are kept by the left join with zero totals.
    */
  def dupNgramStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perGram = Shingles
      .shingleRows(docs.select(col("doc_id"), col("text")), 3)
      .groupBy("doc_id", "shingle")
      .agg(count(lit(1)).as("c"))
    val perDoc = perGram
      .groupBy("doc_id")
      .agg(
        sum("c").as("total_grams"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_grams"))
    docs
      .select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("total_grams", coalesce(col("total_grams"), lit(0L)))
      .withColumn("dup_grams", coalesce(col("dup_grams"), lit(0L)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("total_grams").as("total_grams"),
        sum("dup_grams").as("dup_grams"),
        sum(when(col("dup_grams") * 5 > col("total_grams"), 1L).otherwise(0L)).as("n_flagged"))
  }

  /** t25: character-bigram entropy per source — the classic gibberish /
    * template detector below the word level (used by the public web-
    * crawl curation pipelines alongside the word-level signals):
    * natural text holds a characteristic char-bigram entropy band;
    * base64 blobs and random noise run high, boilerplate and repeated
    * templates run low — and none of t06/t16/t22's word-level stats see
    * it, because tokenization already threw the character structure
    * away.
    *
    * Bigrams are built with ONE O(L) `zip_with` over the split char
    * array (never `transform(sequence …, i -> substring(s, i, 2))`,
    * whose per-position substring makes the projection O(L²) per doc —
    * the Shingles lesson at char granularity). Entropy follows the
    * q103/t17 exact fixed point: per (source, bigram) the contribution
    * is `c · round(1e6·ln(n_s/c))` — every log rounded PER ROW to
    * integer micro-nats, so the per-source sum is an exact integer and
    * `n_s·H` never floats across the hash. One scan, two keyed
    * aggregates (bigram counts are the map-side-combined heavy fold;
    * the per-source entropy fold runs over the distinct-bigram table).
    */
  def charBigramEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cs = split(lower(col("text")), "")
    val bigrams = zip_with(
      slice(cs, lit(1), greatest(size(cs) - 1, lit(0))),
      slice(cs, lit(2), greatest(size(cs) - 1, lit(0))),
      (a, b) => concat(a, b))
    val counts = Tables
      .documents(spark, dir)
      .select(col("source"), explode(bigrams).as("bg"))
      // regex-split may append a trailing "" element; its zip partner is
      // a 1-char fragment, not a bigram — the length gate is the guard
      .filter(length(col("bg")) === 2)
      .groupBy("source", "bg")
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("source").agg(sum("c").as("n_s"))
    counts
      .join(totals, Seq("source"))
      .groupBy("source")
      .agg(
        max("n_s").as("n_bigrams"),
        count(lit(1)).as("distinct_bigrams"),
        sum(col("c") * round(lit(1e6) * log(col("n_s").cast("double") / col("c"))).cast("long"))
          .as("entropy_unats_scaled"))
  }

  /** t26: hashed linear-classifier INFERENCE at corpus scale — the
    * fastText-style quality/domain classifier every curation stack runs
    * over each document (CCNet's LM filter, LLaMA's quality classifiers
    * are this shape: hash n-grams into D buckets, dot the bucket counts
    * with a learned weight vector, threshold). The MODEL here is a
    * deterministic stand-in (weight[b] derived from md5(b) — the
    * environment has no trained artifact), but the inference dataflow is
    * the real one end to end:
    *
    *   tokens → feature bucket (md5 hex digits 1–3, D = 4096) →
    *   per-(doc, bucket) counts (map-side combined — the fact fold) →
    *   broadcast join against the D-row weight table (the model is
    *   dimension-sized state, exactly how a served model ships) →
    *   per-doc score = Σ count·w, threshold at 0.
    *
    * Integer e3 weights end to end, so scores are exact longs and the
    * oracle replays the same arithmetic. At 100 TB: one scan, one doc-key
    * fold, a KB-scale broadcast — no shuffle carries tokens.
    */
  def hashClassifier(spark: SparkSession, dir: String, dim: Int = 4096): DataFrame = {
    // the "model": weight_e3(b) = (hexval4(md5(b)) mod 2001) − 1000 ∈ [−1, 1] e3
    val weights = spark.range(dim.toLong).toDF("bucket")
      .select(col("bucket"),
        (conv(substring(md5(col("bucket").cast("string")), 1, 4), 16, 10).cast("long") % 2001 - 1000)
          .as("w_e3"))
    val feats = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 3), 16, 10).cast("long").as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
    feats
      .join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_tokens"),
        sum(col("c") * col("w_e3")).as("score_e3"))
      .select(col("doc_id"), col("n_tokens"), col("score_e3"),
        when(col("score_e3") > 0, "keep").otherwise("drop").as("label"))
  }

  /** t27: n-gram NOVELTY per document — the memorization-risk signal a
    * training-data pipeline reads before upsampling a source: what
    * fraction of a doc's distinct word-3-grams appear NOWHERE else in
    * the corpus? Low novelty = the doc is assembled from corpus
    * boilerplate (its grams are shared); high novelty = unique content.
    * The per-doc complement of the d02 pair view: d-family operators ask
    * "which PAIRS overlap", this scores EVERY doc against the whole
    * corpus in aggregate — one gram-df table instead of a pair join.
    * Integer discipline: `novelty_permille = n_novel·1000 DIV n_grams`
    * (nonneg, trunc ≡ floor). Shuffle shape: distinct per-doc grams
    * (one shuffle), gram document-frequency (map-side combined), one
    * broadcast-join back — at web scale the df table swaps to a shuffle
    * join, same note as t05.
    */
  def gramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = graft.operators.Shingles
      .shingleRows(Tables.documents(spark, dir), 3)
      .select(col("doc_id"), col("shingle").as("g"))
      .distinct()
    val df = grams.groupBy("g").agg(count(lit(1)).as("gdf"))
    grams
      .join(df, Seq("g"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("gdf") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000 DIV n_grams").as("novelty_permille"))
  }

  /** t28: TOKENIZER FERTILITY per language — chars-per-token under the
    * BPE-ish regex tokenizer (t03's `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
    * classes), the number a pipeline reads to budget context windows
    * and compare tokenizer efficiency across languages. Exact-integer
    * output: per lang, docs / tokens / non-space chars and
    * `chars_per_token_e4 = chars·10000 DIV tokens`. One scan, two
    * per-row regexes, one bounded-key aggregate.
    */
  def tokenFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("toks"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long").as("chars"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("n_tokens"),
        sum("chars").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_chars"),
        expr("n_chars * 10000 DIV n_tokens").as("chars_per_token_e4"))

  /** q143: positional inverted-index PHRASE search — exact multi-word
    * adjacency ("spark stream", "the fast key") via positional postings,
    * the capability BM25/tf-idf bag-of-words scoring (t08/q135) cannot
    * express. Postings are `(doc_id, pos, tok)` from one scan
    * (posexplode — no shuffle to build); a phrase of length L resolves
    * as L−1 equi-joins on `(doc_id, pos + i)`, and each join side is
    * FILTERED TO THE PHRASE'S OWN TERMS FIRST — the predicate reaches
    * the scan, so only the queried terms' postings ever shuffle. At
    * 100 TB with postings bucketed by token, each phrase term is a
    * pruned index lookup and the position join moves postings-of-two-
    * terms, never the corpus — the standard positional-index cost
    * model (Lucene's phrase query) as a dataflow.
    */
  def phraseMatch(spark: SparkSession, dir: String,
      phrases: Seq[Seq[String]] = Seq(Seq("spark", "stream"), Seq("the", "fast", "key"))): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "tok")))
    def occurrences(phrase: Seq[String]): DataFrame = {
      val base = toks.filter(col("tok") === phrase.head).select(col("doc_id"), col("pos"))
      phrase.zipWithIndex.drop(1).foldLeft(base) { case (acc, (w, i)) =>
        acc.join(
          toks.filter(col("tok") === w).select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        .select(lit(phrase.mkString(" ")).as("phrase"), col("doc_id"), col("n_hits"))
    }
    phrases.map(occurrences).reduce(_.unionByName(_))
  }
}
