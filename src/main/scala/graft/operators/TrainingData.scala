package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Training-data curation operators (SURVEY.md §2.4, q42+): the pipeline
  * steps between a raw 100 TB crawl and a training mixture — split
  * assignment, sequence packing, benchmark decontamination, text
  * normalization, boilerplate detection, stratified sampling, and mixture
  * reweighting.
  *
  * Everything is deterministic (hash-derived randomness, never `rand()`):
  * a split/sample decision must be reproducible run-to-run and engine-to-
  * engine, or downstream evals are contaminated by membership drift. All
  * hashes are md5-hex-prefix based so the DuckDB oracle can replay them
  * exactly.
  */
object TrainingData {

  /** Deterministic salted hash fraction in 16 bins per hex digit: the
    * first 4 md5 hex digits of the key, compared lexicographically —
    * equivalent to a 16-bit uniform draw, portable to any engine with
    * md5. 'e666' ≈ 0.9 of the space.
    */
  private def hexKey(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** q42: train/eval split assignment — THE canonical "never random"
    * operator: membership is a pure function of the stable doc_id, so a
    * re-run (or another engine) assigns identically, and joins against
    * yesterday's split are exact. Shuffle-free: one projection over the
    * scan.
    */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang"),
        when(hexKey(col("doc_id")) < "e666", "train").otherwise("eval").as("split"),
      )

  /** q43: sequence packing — assign docs to fixed token-budget packs
    * (the "fill 2048-token context windows" step before tokenizer
    * sharding). Sequential fill in doc_id order within each source: pack
    * id = exclusive-prefix-sum(tokens) div budget. One shuffle
    * (partitioned window per source); at 100 TB sources are the natural
    * pack shards and each packs independently — no global coordination,
    * which is exactly why the pack key includes the source.
    */
  def sequencePacking(spark: SparkSession, dir: String, budget: Int = 2048): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
      )
      .withColumn("cum", sum("n_tokens").over(w))
      .select(
        col("doc_id"),
        col("source"),
        col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).as("pack_id"),
      )
  }

  /** q44: benchmark contamination check — which training docs share
    * 5-shingles with the held-out benchmark set (stand-in: doc_id < 50)?
    * Inverted-index join, same lossless candidate structure as d02: a
    * training doc can only be contaminated if it shares a shingle, and
    * the join is training-postings × DISTINCT benchmark grams (the small
    * side — broadcastable at any corpus scale, since the benchmark is
    * fixed-size while training grows). Shingles are 64-bit-hashed before
    * the shuffle; `n_shared` counts distinct shared grams, so one
    * benchmark doc repeating a gram doesn't inflate the score.
    */
  def contamination(spark: SparkSession, dir: String, benchBelow: Long = 50L): DataFrame = {
    val postings = Shingles
      .shingleRows(Tables.documents(spark, dir), 5)
      .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
      .distinct()
    val benchGrams = postings.filter(col("doc_id") < benchBelow).select("g").distinct()
    val train      = postings.filter(col("doc_id") >= benchBelow)
    val sizes      = train.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    train
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes, Seq("doc_id"))
      .select(
        col("doc_id"),
        col("n_shared"),
        col("n_grams"),
        (col("n_shared").cast("double") / col("n_grams")).as("ratio"),
      )
  }

  /** q45: text normalization — collapse whitespace, lowercase, and report
    * the cleaned fingerprint + size delta. Pure per-row column
    * expressions: shuffle-free, fully codegen'd, the shape every
    * map-style cleaning pass should have.
    */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val clean = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        md5(clean).as("clean_hash"),
        (length(col("text")) - length(clean)).cast("long").as("removed_chars"),
        size(split(clean, " ")).cast("long").as("n_tokens"),
      )
  }

  /** PII redaction patterns (library form; the synthetic corpus carries
    * no PII, so this is spec-tested on controlled inputs rather than
    * driver-verified). Same per-row shuffle-free shape as
    * [[normalizeText]]; patterns are RE2-compatible (no backrefs) so the
    * identical regexes run on engines with either regex dialect.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    // order matters: the most specific pattern first — a bare ssn is also
    // a valid phone-shaped digit run, so ssn must claim it before the
    // phone pass sees the text
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "ssn"   -> "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone" -> "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]",
  )

  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    // each pattern counts and redacts the text AFTER earlier passes, so a
    // span claimed by one category is never also counted by a later one
    val (redacted, counts) =
      piiPatterns.foldLeft((col(textCol), Seq.empty[(String, Column)])) {
        case ((c, acc), (name, pat)) =>
          val n = regexp_count(c, lit(pat)).cast("long")
          (regexp_replace(c, pat, s"<$name>"), acc :+ (s"n_$name" -> n))
      }
    df.withColumns((("redacted" -> redacted) +: counts).toMap)
  }

  /** q46: time-range join — for every error event, how many events (any
    * type) land in the 5 minutes after it (the "blast radius" query).
    * The scalable shape: both sides bucketed to the range width, probe
    * side exploded to (bucket, bucket+1), equi-join on the bucket, exact
    * range predicate after — candidate pairs are bounded by events per
    * 2×width window, never the O(n²) of a raw inequality join, and the
    * join parallelizes on the bucket key. Errors with an empty window
    * are kept (count 0) via the final left join.
    */
  def errorBlastRadius(spark: SparkSession, dir: String, widthUs: Long = 300L * 1000 * 1000): DataFrame = {
    val events = Tables
      .events(spark, dir)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val probes = events
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("us"))
    val bucketed = events.select(col("us").as("e_us"), floor(col("us") / widthUs).as("bucket"))
    val counts = probes
      .select(col("event_id"), col("us"), explode(array(lit(0L), lit(1L))).as("off"))
      .withColumn("bucket", floor(col("us") / widthUs) + col("off"))
      .join(bucketed, Seq("bucket"))
      .filter(col("e_us") > col("us") && col("e_us") <= col("us") + widthUs)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_after"))
    probes
      .join(counts, Seq("event_id"), "left")
      .select(col("event_id"), coalesce(col("n_after"), lit(0L)).as("n_after"))
  }

  /** q47: boilerplate detection — the corpus's most document-frequent
    * 3-shingles (the headers/footers that poison near-dup thresholds at
    * crawl scale). Distinct (doc, gram) then one map-side-combined
    * count; top-k with a total tiebreak order so the result is
    * deterministic.
    */
  def frequentShingles(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    Shingles
      .shingleRows(Tables.documents(spark, dir), 3)
      .distinct()
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(k)

  /** q48: stratified deterministic sample — k docs per language, chosen
    * by hash rank (not `rand()`), so the sample is stable across runs
    * and engines. One shuffle on the stratum key; rank ties broken by
    * doc_id for full determinism.
    */
  def stratifiedSample(spark: SparkSession, dir: String, perStratum: Int = 25): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(hexKey(col("doc_id")), col("doc_id"))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"), row_number().over(w).cast("long").as("r"))
      .filter(col("r") <= perStratum)
  }

  /** q49: mixture reweighting — downsample over-represented languages to
    * a uniform target share via per-stratum acceptance rates applied to
    * the doc's hash draw. The acceptance test is `hash_frac <
    * target/actual`, so strata at or under target keep everything and
    * over-represented strata thin deterministically. Two tiny aggregates
    * (per-stratum counts) + a broadcast join against the fact scan: the
    * 100 TB shape, since strata stats are KBs regardless of corpus size.
    */
  /** q60: weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * exponential keys): each doc draws `e = -ln(u) / w` with `u` a
    * deterministic md5 uniform in (0,1] and weight `w` = n_chars; the k
    * SMALLEST keys are the sample — provably equivalent to sequential
    * weighted draws without replacement, and the standard way to bias a
    * training sample toward long/high-quality documents reproducibly.
    * The selection is `orderBy.limit(k)`, which Spark executes as
    * per-partition top-k + a k-row merge (TakeOrderedAndProject) — never
    * a global sort: the 100 TB shape for "pick 10k docs by weight".
    */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    // 32-bit md5 uniform, +1 so u is never 0 (ln(0) = -inf)
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("double") + 1.0) /
      lit(4294967297.0)
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (-log(u) / col("n_chars").cast("double")).as("ekey"))
      // rank on the 12-decimal-QUANTIZED key with an id tiebreak: ln()
      // differs between libms in the last ulp, and on a dense-enough
      // corpus two raw keys land within that noise of each other, making
      // the raw order engine-dependent (first seen at sf0.1). Quantizing
      // keeps ~7 significant digits of the weight (sampling quality
      // intact) while the comparison becomes noise-immune unless a key
      // sits within 1e-16 relative of a quantization boundary.
      .orderBy(round(col("ekey"), 12), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("n_chars"), round(col("ekey"), 6).as("ekey"))
  }

  def mixtureSample(spark: SparkSession, dir: String, targetShare: Double = 0.2): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
    // corpus total via a broadcast one-row join — an empty-partition
    // window would funnel the (tiny) counts table through one partition
    // AND log the WindowExec warning the fleet treats as a red flag
    val stats = counts
      .crossJoin(broadcast(counts.agg(sum("cnt").as("total"))))
      .select(col("lang"), (lit(targetShare) / (col("cnt").cast("double") / col("total"))).as("rate"))
    // 16-bit hash draw in [0,1): same digits the oracle reconstructs
    val frac = (conv(hexKey(col("doc_id")), 16, 10).cast("double") / 65536.0)
    docs
      .join(broadcast(stats), Seq("lang"))
      .filter(frac < col("rate"))
      .select(col("doc_id"), col("lang"), round(col("rate"), 6).as("rate"))
  }

  /** q94: temperature-scaled mixture weights — the α-sampling rule
    * (α = 0.5) a multilingual/multi-source training run uses to set
    * per-source sampling rates: weight ∝ (source token count)^α,
    * upweighting small sources against the head without letting them
    * dominate. Computed entirely in INTEGER micro-units so the table is
    * engine- and order-independent: r_s = floor(sqrt(tok_s)·10⁶) (IEEE
    * sqrt is correctly rounded, so identical doubles on any engine;
    * everything after is exact DECIMAL/BIGINT `DIV` — no float ever
    * sums across rows). Emits each source's uniform share, temperature
    * weight, and expected epoch factor at a one-total-token budget
    * (weight·total/tok — >10⁶ means the source repeats). Shape: one
    * map-side-combined per-source aggregate, a broadcast 1-row totals
    * join; nothing scales past the scan.
    */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("tok"))
      .withColumn("r", floor(sqrt(col("tok").cast("double")) * 1e6))
    val totals = perSource.agg(
      sum("tok").as("total_tok"), sum("r").as("total_r"))
    perSource
      .crossJoin(broadcast(totals))
      .withColumn("share_ppm", expr("CAST(tok AS DECIMAL(38,0)) * 1000000 DIV total_tok"))
      .withColumn("weight_ppm", expr("CAST(r AS DECIMAL(38,0)) * 1000000 DIV total_r"))
      .withColumn("epochs_ppm", expr("CAST(weight_ppm AS DECIMAL(38,0)) * total_tok DIV tok"))
      .select(col("source"), col("tok").as("tokens"),
        col("share_ppm"), col("weight_ppm"), col("epochs_ppm"))
  }

  /** q79: the END-TO-END curation pipeline — the single query a user
    * runs to turn the raw crawl into the training corpus, composing the
    * fleet's stages in their production order:
    *
    *  1. exact-dup keepers only (d01's min-id-per-content-hash rule);
    *  2. the benchmark/eval set held out entirely (ids < benchBelow —
    *     the q44 convention);
    *  3. decontamination: drop any doc sharing ≥ maxContamination of
    *     its 5-gram shingles with the benchmark set (q44's overlap,
    *     broadcast inverted index);
    *  4. quality gate: alpha_ratio ≥ minAlpha (t02's scorer).
    *
    * Shapes compose without re-reading the corpus per stage: one
    * content-hash combine (2), one shingle pass (3 — bench grams
    * broadcast), the quality score a scan projection on the final
    * pass. Every stage is individually oracle-checked elsewhere
    * (d01/q44/t02); this row pins their COMPOSITION hash-exact, the
    * way the stages actually ship.
    */
  def curationPipeline(spark: SparkSession, dir: String, minAlpha: Double = 0.81,
      maxContamination: Double = 0.5, benchBelow: Long = 50L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val keepers = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val contaminated = contamination(spark, dir, benchBelow)
      .filter(col("ratio") >= maxContamination)
      .select("doc_id")
    docs
      .filter(col("doc_id") >= benchBelow)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("alpha_ratio",
        round(length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") / length(col("text")), 4))
      .filter(col("alpha_ratio") >= minAlpha)
      .select(col("doc_id"), col("lang"), col("alpha_ratio"), col("n_chars"))
  }

  /** q74: exact global quality-decile assignment — the "keep the top 30%
    * by quality score" curation gate, computed EXACTLY (rank-based, not
    * approx-percentile) without a single-partition window. Same
    * decomposition as q12's prefix sum, applied to ranks:
    *
    *  1. score each doc (t02's alpha_ratio — a scan projection);
    *  2. band = floor(score·50) — a deterministic, data-derived RANGE
    *     key with ≤51 values, so the per-band offset table is tiny at
    *     any corpus size and floor's monotonicity means band order IS
    *     score order;
    *  3. exclusive per-band offsets via a triangular broadcast
    *     self-join over the band-count table (no window at all);
    *  4. within-band row_number under a PARTITIONED window (bounded by
    *     the band's population, spread across the cluster) + offset →
    *     the exact global rank, rn;
    *  5. decile = floor((rn−1)·10/n)+1 with the total broadcast — the
    *     same fill-first-buckets-extra split SQL NTILE produces, but
    *     spelled arithmetically so both engines compute the identical
    *     integer.
    *
    * Band skew is the knob: a band holding p% of the corpus bounds one
    * window partition at p% of rows. For a score with mass points
    * (e.g. exact 0/1 ratios) widen the band key with a secondary column
    * the way q62 salts — documented, not needed for this score shape.
    *
    * The band key assumes score ∈ [0,1] (true of the alpha-ratio it
    * computes). Rather than silently mis-band a future unbounded score,
    * the key raises at runtime on any out-of-range value — a scan-side
    * check, no extra exchange, so the zero-SinglePartition plan shape
    * is preserved (a min/max-derived band like q69's would need a
    * scalar aggregate).
    */
  def qualityDeciles(spark: SparkSession, dir: String, tiles: Int = 10): DataFrame = {
    // NULL score (empty/NULL text → 0/0 → NULL) is not an out-of-range
    // value: it flows through as a NULL band (and drops at the band
    // join), it must not trip the raise. The error message coalesces so
    // it can never itself be NULL (a NULL-message raise_error kills the
    // query with a useless error).
    val checkedScore = when(col("score").isNull, lit(null))
      .when(col("score").between(0, 1), col("score"))
      .otherwise(raise_error(concat(
        lit("qualityDeciles: score outside [0,1] breaks the band key: "),
        coalesce(col("score").cast("string"), lit("NULL")))))
    val scored = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        // try_divide: a zero-length text is NULL score under ANSI and
        // non-ANSI alike (plain `/` throws DIVIDE_BY_ZERO when ANSI is on)
        round(
          try_divide(length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double"),
            length(col("text"))),
          4).as("score"))
      .withColumn("band", floor(checkedScore * 50))
    // NULL bands never survive the equi-join below, so they must not
    // count toward the corpus total n either — otherwise unscorable
    // docs would skew every decile boundary
    val counts = scored.filter(col("band").isNotNull).groupBy("band").agg(count(lit(1)).as("cnt"))
    // exclusive offset (rows in STRICTLY HIGHER bands — rank runs
    // score-desc) AND the corpus total, both from one cross of the tiny
    // band table with itself: a separate scalar count(*) would be the
    // only SinglePartition exchange in the plan, and it isn't needed
    val meta = counts
      .as("a")
      .crossJoin(broadcast(counts.as("b")))
      .groupBy(col("a.band").as("band"))
      .agg(
        sum(when(col("b.band") > col("a.band"), col("b.cnt"))).as("offset"),
        sum(col("b.cnt")).as("n"))
    val w = Window.partitionBy("band").orderBy(col("score").desc, col("doc_id"))
    scored
      .join(broadcast(meta), Seq("band"))
      .withColumn("rn", coalesce(col("offset"), lit(0L)) + row_number().over(w))
      .select(
        col("doc_id"),
        col("score"),
        (floor((col("rn") - 1) * tiles / col("n")) + 1).cast("long").as("decile"),
      )
  }

  /** q86: stable global example IDs + deterministic shard assignment —
    * the step that turns a curated corpus into numbered training shards
    * a data loader can address (`shard i, example j`), reproducibly on
    * any cluster. Every doc gets the exact global row number under the
    * curriculum order (n_chars DESC, doc_id — longest-first), and
    * shard = seq mod nShards (round-robin: shard sizes differ by ≤1 and
    * every shard samples the whole length distribution — a contiguous
    * split would put all long docs in shard 0).
    *
    * Exact global ranks WITHOUT a single-partition window — the
    * q12/q74 prefix-sum decomposition applied to the length key:
    * band = n_chars div 64 (monotone in the sort key, so band order IS
    * length order; band count is bounded by max doc length/64, not
    * corpus size), exclusive offsets from the triangular broadcast
    * self-join over the tiny band-count table, within-band row_number
    * under a PARTITIONED window. Band skew note: a pathological corpus
    * with every doc the same length puts one band on one window
    * partition — widen the band with a doc_id salt exactly like q62 if
    * that ever describes real data.
    */
  def globalShardIds(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val banded = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("band", (col("n_chars") / 64).cast("long"))
    val counts = banded.groupBy("band").agg(count(lit(1)).as("cnt"))
    // offset = rows in STRICTLY LONGER bands (order runs n_chars desc)
    val offsets = counts
      .as("a")
      .join(broadcast(counts.as("b")), col("b.band") > col("a.band"), "left")
      .groupBy(col("a.band").as("band"))
      .agg(sum(col("b.cnt")).as("offset"))
    val w = Window.partitionBy("band").orderBy(col("n_chars").desc, col("doc_id"))
    banded
      .join(broadcast(offsets), Seq("band"))
      .withColumn("seq", coalesce(col("offset"), lit(0L)) + row_number().over(w) - 1L)
      .select(
        col("doc_id"),
        col("n_chars"),
        col("seq"),
        (col("seq") % nShards).as("shard"))
  }

  /** q90: per-language MEDIAN ABSOLUTE DEVIATION of document length —
    * the robust outlier statistic quality filters cut on (mean/stddev
    * move with the outliers they are supposed to catch; median/MAD do
    * not). Two exact-percentile aggregations: per-group median, then
    * the median of absolute deviations from it — the per-group medians
    * are a tiny table, broadcast back onto the scan (no second
    * shuffle of the corpus beyond the group-by). Exact percentiles hold
    * per-group value buffers on the reducer — the q20/q56 class; at
    * 100 TB per-group state is bounded by the largest language, sharded
    * across the cluster by group.
    */
  def madRobust(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("lang"), col("n_chars"))
    val med = docs.groupBy("lang").agg(expr("percentile(n_chars, 0.5D)").as("med"))
    docs
      .join(broadcast(med), Seq("lang"))
      .groupBy("lang")
      .agg(
        first("med").as("med"),
        expr("percentile(abs(n_chars - med), 0.5D)").as("mad"),
        count(lit(1)).as("n"))
  }

  /** q75: sliding-window chunking with overlap — the RAG/context-window
    * prep step that turns documents into fixed-token-budget chunks
    * (width tokens, stride-token hop, so consecutive chunks share
    * width−stride tokens of context). Chunk count per doc is
    * 1 + ceil((n−width)/stride) so the final partial window is kept —
    * a truncating chunker silently drops up to width−1 trailing tokens
    * per doc.
    *
    * Pure scan projection + generator (split → sequence → explode →
    * slice): no shuffle, no state, embarrassingly parallel — the right
    * shape for a 100 TB corpus where chunking is a pass-through stage
    * feeding tokenization. Output size is the only cost knob
    * (width/stride = 64/48 inflates the corpus ≈ width/stride ≈ 1.33×).
    */
  def chunkOverlap(spark: SparkSession, dir: String, width: Int = 64, stride: Int = 48): DataFrame = {
    val nChunks =
      when(col("n") <= width, lit(1L))
        .otherwise(floor((col("n") - width + stride - 1) / lit(stride.toDouble)) + 1L)
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))
      .select(
        col("doc_id"),
        col("toks"),
        explode(sequence(lit(0), (nChunks - 1).cast("int"))).as("chunk_id"))
      .withColumn("ctoks", slice(col("toks"), col("chunk_id") * stride + 1, lit(width)))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"),
      )
  }

  /** q91: DSIR data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") — rank raw-pool docs by
    * how much their hashed-n-gram profile looks like a target domain.
    * Bag-of-hashed-unigrams with B = 256 md5-derived buckets; both the
    * target and raw bucket histograms are +0.5-smoothed unigram LMs, and
    * a doc's importance weight is Σ_tok [ln p_tgt(b) − ln p_raw(b)].
    *
    * Scored in EXACT INTEGER MICRO-NATS: each bucket's per-occurrence
    * log-ratio is rounded once to an integer (k_unats), and the per-doc
    * score is an integer sum — order-independent and engine-exact, where
    * a double sum over shuffled token order is not (the q62 lesson; a
    * 1-ulp libm ln() difference only matters if a bucket constant sits
    * within ~1e-15 relative of a .5 micro-nat boundary).
    *
    * The 100 TB shape: ONE token scan feeds both histograms (groupBys on
    * a 256-key space — map-side combine makes the shuffle 256 rows per
    * partition); the k_unats table (≤ B rows) broadcasts into the
    * scoring scan; per-doc scores are a map-side-combinable sum keyed by
    * doc_id; the final cut is orderBy+limit = TakeOrderedAndProject
    * (per-partition top-k + k-row merge, never a global sort).
    */
  def dsirSample(spark: SparkSession, dir: String,
      targetSource: String = "src0", k: Int = 100): DataFrame = {
    val B = 256
    val toks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("b", conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("int"))
    val nRaw = toks.groupBy("b").agg(count(lit(1)).as("n_raw"))
    val nTgt = toks.filter(col("source") === targetSource)
      .groupBy("b").agg(count(lit(1)).as("n_tgt"))
    val tot = toks.agg(
      count(lit(1)).as("raw_total"),
      sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("tgt_total"))
    val kTable = nRaw
      .join(nTgt, Seq("b"), "left")
      .na.fill(0L, Seq("n_tgt"))
      .crossJoin(broadcast(tot))
      .select(col("b"),
        round(lit(1e6) *
          (log((col("n_tgt") + lit(0.5)) / (col("tgt_total") + lit(B / 2.0))) -
           log((col("n_raw") + lit(0.5)) / (col("raw_total") + lit(B / 2.0)))))
          .cast("long").as("k_unats"))
    toks
      .filter(col("source") =!= targetSource)
      .join(broadcast(kTable), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("k_unats").as("score_unats"))
      .orderBy(col("score_unats").desc, col("doc_id"))
      .limit(k)
  }

  /** q103: per-shard SOURCE-MIX entropy — the shard-homogeneity audit
    * run after q86's sharding: a shard whose source distribution
    * collapsed (entropy → 0) trains on one crawl's biases for its whole
    * slice of the epoch; healthy shards sit near the corpus-wide mix.
    * Reported as scaled integer micro-nats (n_docs · H in the same
    * per-row-rounded fixed point as t17's KL) so the result is
    * hash-exact across engines: H = Σ (n_ss/n_s)·ln(n_s/n_ss), and
    * n_s·H = Σ n_ss·ln(n_s/n_ss) needs no final float division.
    *
    * Scale shape: the shard assignment is q86's banded prefix-sum (no
    * global sort, no SinglePartition), then two map-side-combined
    * aggregates over (shard, source) — a 8×#sources table — and the
    * entropy fold runs over THAT, not the corpus.
    */
  def shardMixEntropy(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val byShardSource = globalShardIds(spark, dir, nShards)
      .join(src, Seq("doc_id"))
      .groupBy("shard", "source")
      .agg(count(lit(1)).as("n_ss"))
    val shardTot = byShardSource.groupBy("shard").agg(sum("n_ss").as("n_s"))
    byShardSource
      .join(broadcast(shardTot), Seq("shard"))
      .select(col("shard"), col("n_s"),
        (col("n_ss") *
          round(lit(1e6) * log(col("n_s").cast("double") / col("n_ss").cast("double")))
            .cast("long")).as("c"))
      .groupBy("shard")
      .agg(max("n_s").as("n_docs"), sum("c").as("entropy_unats_scaled"))
  }

  /** q104: LEAKAGE-SAFE train/eval split — the correction q42 alone
    * cannot give: a per-document hash split puts two near-duplicates on
    * opposite sides often (for a duplicate pair, P ≈ 2·p·(1−p)), and an
    * eval doc whose near-twin was trained on is effectively train data —
    * the classic silent eval inflation. The fix is to split by NEAR-DUP
    * CLUSTER: d06's connected-component label is the split unit (a doc
    * in no near-dup pair is its own singleton cluster = its id), and
    * q42's deterministic md5 rule is applied to the CLUSTER id, so a
    * whole duplicate family always moves together. Output carries the
    * per-doc assignment plus the cluster id so downstream dedup can
    * still pick one representative per side.
    *
    * Scale shape: dominated by d06 (bucketed LSH candidates + min-label
    * CC, already linear-ish and lineage-cut); the split itself is one
    * keyed left join of the label table onto the corpus and a
    * scan-shaped projection — no new shuffle class beyond d06's.
    */
  /** q112: the r12 curation composition — the CLEANED corpus a training
    * run actually ingests, chaining this round's operators end to end:
    * Gopher quality gate (t13) → corpus-wide substring-dedup REWRITE
    * (d16: duplicated spans cut, owner keeps) → majority-original gate
    * (docs more than half removed are boilerplate shells, dropped) →
    * LEAKAGE-SAFE split (q104: the md5 rule on the d06 near-dup CLUSTER
    * id, so a duplicate family never straddles train/eval) →
    * deterministic shard (first md5 hex digit mod 8). Output is the
    * loader contract: (doc_id, split, shard, kept_tokens, clean_text).
    *
    * Scale shape: strictly the union of its parts' shapes — every stage
    * is the already-audited operator (d16's windowed postings, d06's
    * lineage-cut CC, scan-shaped gates); the composition adds only
    * doc-keyed joins. Spans are computed CORPUS-WIDE before the gates
    * select (the rewrite must see every copy of a span to pick its
    * owner — gating first would resurrect duplicates whose owner was
    * gated away).
    */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val gate = TextAnalysis.gopherQuality(spark, dir)
      .filter(col("passes_gopher") === 1)
      .select(col("doc_id"))
    val rewritten = Dedup.substringRewrite(spark, dir)
    val labels    = Dedup.dedupClusters(spark, dir).select(col("doc_id"), col("cluster"))
    rewritten
      .join(gate, Seq("doc_id"), "left_semi")
      .filter((col("n_tokens") - col("kept_tokens")) * 2 < col("n_tokens"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .select(
        col("doc_id"),
        when(substring(md5(col("cluster").cast("string")), 1, 4) < "e666", "train")
          .otherwise("eval").as("split"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10).cast("long") % 8)
          .as("shard"),
        col("kept_tokens"), col("clean_text"))
  }

  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val labels = Dedup.dedupClusters(spark, dir).select(col("doc_id"), col("cluster"))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), col("lang"), col("cluster"),
        when(substring(md5(col("cluster").cast("string")), 1, 4) < "e666", "train")
          .otherwise("eval").as("split"))
  }

  /** q132: WALK-FORWARD (rolling-origin) evaluation splits — the
    * time-series discipline q42 (hash) and q104 (cluster) cannot give:
    * when examples carry timestamps, a random split leaks the FUTURE into
    * training; the honest protocol trains on everything ≤ tᵢ and tests on
    * (tᵢ, tᵢ+h], sliding the origin forward. Four expanding folds over
    * the events feed (origin 2024-01-08, horizon 5 days), each fold
    * audited with its COLD-START rate — test-window users the train side
    * has never seen (the population a deployed model actually fails on).
    *
    * Shape: ONE scan folds to per-(user, day) activity (bounded: users ×
    * calendar days); fold membership is a broadcast join against the
    * 4-row fold spec; train/test counts come from the same tiny fold —
    * the fact table is never touched per fold. Cold-start = the user's
    * first-ever event day (min over the same fold) falls after the
    * fold's train end.
    */
  /** q142: DATA CARD — the one-row corpus datasheet ("nutrition label",
    * Gebru et al. 2021's Datasheets idea operationalized) every shipped
    * training set carries: sizes, composition, duplication, and
    * concentration folded in ONE pass plus the d01-discipline hash fold.
    * All exact integers: counts, token totals, exact-duplicate ratio in
    * ppm (docs whose full-text md5 collides with another doc), mean doc
    * tokens (DIV), and the largest language's share in ppm (the
    * monolingual-skew headline).
    *
    * Scale: one tokenize scan (map-side combined), one md5 groupBy for
    * the dup fold, two tiny re-aggregates; the card is a constant-size
    * row whatever the corpus — the cheapest artifact with the highest
    * read-to-cost ratio in the whole pipeline.
    */
  def dataCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.select(
      col("doc_id"), col("lang"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("toks"),
      md5(col("text")).as("h"))
    val core = base.agg(
      count(lit(1)).as("n_docs"),
      sum("toks").as("n_tokens"),
      countDistinct("lang").as("n_langs"),
      countDistinct("source").as("n_sources"))
    val dup = base.groupBy("h").agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_docs"))
    val topLang = base.groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(max("n").as("top_lang_docs"))
    core.crossJoin(broadcast(dup)).crossJoin(broadcast(topLang))
      .select(
        col("n_docs"), col("n_tokens"), col("n_langs"), col("n_sources"),
        col("dup_docs"),
        expr("CAST(dup_docs * 1000000 DIV n_docs AS BIGINT)").as("dup_ppm"),
        expr("n_tokens DIV n_docs").as("mean_doc_tokens"),
        expr("CAST(top_lang_docs * 1000000 DIV n_docs AS BIGINT)").as("top_lang_ppm"))
  }

  def walkForwardSplits(spark: SparkSession, dir: String): DataFrame = {
    val h = 5L                            // horizon, days
    val d0 = 19730L                       // 2024-01-08 as epoch days (midnight UTC)
    val folds = spark.range(4).toDF("fold")
      .select(col("fold"), (lit(d0) + col("fold") * h).as("train_end_day"))
    // ONE scan → bounded per-(user, day) cells (users × calendar days)
    val cells = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    val firstSeen = cells.groupBy("user_id").agg(min("day").as("first_day"))
    // fold membership fans cells out ≤4× (the CELL table, never the facts)
    val byFold = cells
      .join(broadcast(firstSeen), Seq("user_id"))
      .crossJoin(broadcast(folds)) // 4-row fold spec: a bounded ×4 fan-out
      .filter(col("day") < col("train_end_day") + h) // train days OR this fold's test days
      .withColumn("in_train", col("day") < col("train_end_day"))
      .withColumn("in_test",
        col("day") >= col("train_end_day") && col("day") < col("train_end_day") + h)
    byFold
      .groupBy("fold", "train_end_day")
      .agg(
        sum(when(col("in_train"), col("n")).otherwise(0L)).as("n_train"),
        sum(when(col("in_test"), col("n")).otherwise(0L)).as("n_test"),
        countDistinct(when(col("in_test"), col("user_id"))).as("n_test_users"),
        countDistinct(when(col("in_test") && col("first_day") >= col("train_end_day"),
          col("user_id"))).as("n_cold_users"))
      .select(col("fold"),
        date_format(timestamp_micros(col("train_end_day") * 86400000000L), "yyyy-MM-dd")
          .as("train_end"),
        col("n_train"), col("n_test"), col("n_test_users"), col("n_cold_users"))
  }
}
