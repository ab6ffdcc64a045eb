package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication family over `documents` (SURVEY.md §2.4, d01-d05).
  *
  * Scale posture: nothing here is O(n^2) on the full corpus. Candidate
  * pairs are always generated inside bounded buckets (length bands, LSH
  * band-buckets, simhash chunks, hyperplane buckets) and only candidates
  * pay the exact-verification cost. At 100 TB the bucket keys become the
  * shuffle keys; skewed mega-buckets are handled by AQE skew-join plus a
  * frequency cap (drop buckets above a bound, standard LSH practice).
  */
object Dedup {

  /** d08: passage-level dedup — boilerplate removal BELOW document
    * granularity (the CCNet/RefinedWeb step exact doc-dedup can't do:
    * shared headers/footers/navigation recur across otherwise-distinct
    * pages). Documents are chunked into fixed `passageWords`-word
    * passages; a passage is kept only at its first corpus occurrence
    * (min (doc_id, idx) — deterministic keeper), and each document is
    * reassembled from its surviving passages in order.
    *
    * Scale shape: chunking is a scan-side projection (no shuffle); the
    * corpus-wide passage table groups by passage hash with map-side
    * combine (duplicates collapse before the shuffle); reassembly groups
    * by doc_id. Two shuffles total, both on keys with bounded groups —
    * no window over the corpus, no join wider than passage→keeper.
    */
  def passageDedup(spark: SparkSession, dir: String, passageWords: Int = 8): DataFrame = {
    val w = passageWords
    val chunks = Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("words"))
      .select(col("doc_id"),
        expr(s"(size(words) + ${w - 1}) div $w").as("nch"),
        posexplode(expr(
          s"transform(sequence(0, (size(words) + ${w - 1}) div $w - 1)," +
          s" i -> array_join(slice(words, i * $w + 1, $w), ' '))")).as(Seq("idx", "passage")))
    val keeper = chunks
      .groupBy("passage")
      .agg(min(struct(col("doc_id"), col("idx"))).as("keep"))
    chunks
      .join(keeper, Seq("passage"))
      .filter(col("doc_id") === col("keep.doc_id") && col("idx") === col("keep.idx"))
      .groupBy("doc_id")
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("idx"), col("passage")))),
            x => x.getField("passage"))).as("clean_text"),
        count(lit(1)).as("n_kept"),
        (first("nch") - count(lit(1))).as("n_dropped"),
      )
  }

  /** d09: fuzzy entity matching — classic blocked entity resolution over
    * the `part` catalog: candidate pairs are generated only WITHIN a
    * blocking key (attribute + first name token — the standard
    * prefix/attribute block), then verified with exact Levenshtein edit
    * distance. The equi-join on the block key is what keeps this off the
    * n² cliff: pair cost is Σ blockSize², bounded by the blocking choice,
    * and the quadratic-ish work happens per block partition, never
    * corpus-wide (same shape discipline as d02's posting cap). Tighten
    * the block (more prefix tokens, size bands) as entity counts grow.
    */
  def fuzzyMatch(spark: SparkSession, dir: String, maxEdit: Int = 2): DataFrame = {
    val p = Tables
      .part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_type"),
        split(col("p_name"), " ").getItem(0).as("blk"))
    // verify on the DISTINCT-name table: entity names repeat heavily, so
    // the O(len²) edit-distance DP runs once per name pair (vocab²-bounded
    // within a block), not once per key pair; |len diff| > maxEdit pairs
    // are pruned before the DP ever runs (lossless: lev >= len diff).
    // r17: the self-join's output stage carries the DP — quadratic CPU on
    // KB-scale inputs — and AQE sizes its partitions by input BYTES, so it
    // coalesced the whole DP onto 1-2 tasks (sf1 probe: 48 s flat at any
    // core count). Pin the block-keyed exchange at defaultParallelism
    // (user repartitions are exempt from AQE coalescing; both self-join
    // sides reuse the one exchange) — guide §8's small-rows/huge-CPU rule,
    // scale-adaptive via the core count, never a fact-table shuffle.
    val names = p.select("p_type", "blk", "p_name").distinct()
      .repartition(spark.sparkContext.defaultParallelism, col("p_type"), col("blk"))
    val nearNames = names
      .select(col("p_type"), col("blk"), col("p_name").as("name_a"))
      .join(names.select(col("p_type"), col("blk"), col("p_name").as("name_b")), Seq("p_type", "blk"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxEdit)
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("edit_dist") <= maxEdit)
    // expand verified name pairs back to entity-key pairs; each unordered
    // key pair surfaces exactly once (from the (name(key_a), name(key_b))
    // direction that puts the smaller key first)
    nearNames
      .join(p.select(col("p_type"), col("blk"), col("p_name").as("name_a"), col("p_partkey").as("key_a")),
        Seq("p_type", "blk", "name_a"))
      .join(p.select(col("p_type"), col("blk"), col("p_name").as("name_b"), col("p_partkey").as("key_b")),
        Seq("p_type", "blk", "name_b"))
      .filter(col("key_a") < col("key_b"))
      .select(col("p_type"), col("blk"), col("key_a"), col("key_b"),
        col("name_a"), col("name_b"), col("edit_dist"))
  }

  /** d10: containment detection — the ASYMMETRIC near-dup case Jaccard
    * misses: a short document swallowed by a longer one (quote pages,
    * excerpt farms, boilerplate-wrapped reposts) scores low symmetric
    * Jaccard but high one-sided coverage. A pair qualifies when ≥
    * `coverage` of the SMALLER doc's 3-word shingles appear in the
    * larger. Same lossless inverted-index candidate generation and df
    * cap as d02 — candidate cost is Σ df² over rare grams, never n².
    */
  def containment(spark: SparkSession, dir: String, coverage: Double = 0.9, maxDf: Int = 100): DataFrame = {
    val docs  = Shingles.hashedShingleSets(Tables.documents(spark, dir), 3)
    val sizes = docs.select(col("doc_id"), size(col("grams")).cast("long").as("n"))
    val exploded = docs.select(col("doc_id"), explode(col("grams")).as("g"))
    val rare = exploded
      .groupBy("g")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("g")
    val posts = exploded.join(rare, Seq("g"), "left_semi")
    posts.as("a")
      .join(posts.as("b"), col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .filter(col("common") >= lit(coverage) * col("n_a") && col("n_a") < col("n_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("common").cast("double") / col("n_a"), 4).as("coverage"),
        col("n_a"), col("n_b"))
  }

  /** d01: exact dedup via content hash — one map-side-combined groupBy. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper"))

  /** d02: exact word-3-gram Jaccard near-dup with inverted-index candidate
    * generation: a pair can only have J > 0 if it shares a shingle, so
    * joining the gram -> doc posting lists is a LOSSLESS candidate filter.
    * Posting lists longer than `maxDf` docs are dropped BEFORE the join —
    * from candidate generation AND from the verify overlap count, so a
    * binding cap undercounts |A∩B| for corpus-common grams. A J >= 0.5
    * pair here shares ~45+ shingles, so dropping it would need every
    * shared shingle to be corpus-common — vanishingly unlikely, and the
    * cap is what bounds the join at 100 TB (sum of df^2 over rare grams,
    * never n^2). Exact whenever maxDf >= the corpus max df (true here:
    * max df 25 vs cap 100).
    *
    * Document frequency is a `groupBy(g).count` + semi-join (map-side
    * combined partial aggregate, narrow shuffle) — NOT a window count,
    * which would sort every posting row inside each gram partition.
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5, maxDf: Int = 100): DataFrame = {
    val docs  = Shingles.hashedShingleSets(Tables.documents(spark, dir), 3)
    val sizes = docs.select(col("doc_id"), size(col("grams")).as("n"))
    val exploded = docs.select(col("doc_id"), explode(col("grams")).as("g"))
    val rareGrams = exploded.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
    val postings = exploded.join(rareGrams.select("g"), Seq("g"), "left_semi")
    // |A intersect B| falls straight out of the posting-list join: count the
    // co-occurring grams per pair.
    val overlap = postings
      .as("x")
      .join(postings.as("y"), Seq("g"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    overlap
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .withColumn("jaccard", col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** d03: MinHash + LSH — word-5-shingle -> 32-hash signature -> 16 bands
    * of 2 -> band-bucket join for candidates -> exact Jaccard verification.
    *
    * Everything is flat codegen aggregates over the (doc_id, shingle-hash)
    * rows: the 16 minhashes are 16 `min(hash(g, j))` columns (no arrays,
    * no interpreted lambdas), band keys hash adjacent signature pairs, and
    * the exact verify reuses the d02 posting-overlap count restricted to
    * LSH candidates. Word shingles (not char grams) keep the background
    * similarity of this vocab-limited corpus near zero so band buckets
    * stay tiny; 16x2 banding catches a 0.5-Jaccard pair with ~99%
    * probability and a 0.67 pair (the sf1 short-doc near-dup floor)
    * with 1 − 7e-5.
    *
    * The verify stage NEVER sees the full corpus, and never joins
    * postings against postings on a bare gram key: the overlap count is
    * routed THROUGH the candidate pairs — join postings to `doc_a`, then
    * to `(doc_b, gram)` — so a gram can only meet itself inside one
    * pair's rows. A corpus-common 5-shingle (boilerplate headers at
    * 100 TB) therefore cannot go quadratic in its document frequency;
    * verify cost is sum over candidate pairs of their shingle counts,
    * linear in what the verify must read anyway. Sizes (the Jaccard
    * denominator) come from postings left-semi-joined to candidate docs.
    */
  def minhashLsh(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    // 32 hashes = 16 bands of 2 (r10; was 8 bands): the sf1 near-dup
    // corpus put real pairs at J ≈ 0.67 (short docs whose replica
    // suffix moves 4 of ~20 shingles), where 8-band miss probability
    // (1 − J²)⁸ ≈ 8.5e-3 dropped 17 of 250,600 true pairs. 16 bands
    // push that to (1 − J²)¹⁶ ≈ 7e-5 — exact on every corpus probed —
    // for 16 more min() aggregates in the one signature pass.
    val numHashes = 32
    val postings = Shingles
      .shingleRows(Tables.documents(spark, dir), 5)
      .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
      .distinct()
    val minAggs = (0 until numHashes).map(j => min(hash(col("g"), lit(j))).as(s"m$j"))
    val sigs    = postings.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until numHashes / 2).map(b => hash(col(s"m${2 * b}"), col(s"m${2 * b + 1}")))
    val buckets = sigs.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_key")))
    val cands = buckets
      .as("x")
      .join(buckets.as("y"), Seq("band_idx", "band_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val candDocs = cands
      .select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id")))
      .distinct()
    val sizes = postings
      .join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"))
    val overlap = cands
      .join(postings.as("x"), col("doc_a") === col("x.doc_id"))
      .join(postings.as("y"), col("doc_b") === col("y.doc_id") && col("x.g") === col("y.g"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
    overlap
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .withColumn("jaccard", col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** d04: SimHash — a 64-bit fingerprint from signed bit-votes of
    * word-4-shingle hashes. The 64 bits come from the first 16 hex digits
    * of `md5(shingle)` (4 bits per digit) — md5, not xxhash64, so the
    * identical fingerprint is computable by the DuckDB oracle. Candidates
    * must share one of the fingerprint's four 16-bit chunks — EXACT for
    * hamming distance <= 3 by pigeonhole, so the bucketed output IS the
    * exact hamming<=maxHamming pair set the oracle cross-checks — and are
    * verified with bit_count over per-chunk XORs. Every stage is flat
    * codegen (22 packed vote aggregates, integer bit ops, no arrays);
    * background chunk collisions are ~n^2/2^16 because word-shingle
    * fingerprints of unrelated docs are near-random on this corpus.
    */
  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val rows = Shingles
      .shingleRows(Tables.documents(spark, dir), 4)
      .select(col("doc_id"), md5(col("shingle")).as("h"))
      .distinct()
    // hex digit p (0..15) of the md5 carries fingerprint bits 4p..4p+3
    val digits = (0 until 16).map(p => conv(substring(col("h"), p + 1, 1), 16, 10).cast("long").as(s"d$p"))
    val withDigits = rows.select(col("doc_id") +: digits: _*)
    // Bit-vote counting packed 3-per-long in 21-bit lanes: 22 aggregate
    // columns instead of 64 keeps the generated aggregate class small
    // (the 64-column version took 10+ s of janino compilation on first
    // execution — dominating a run-once benchmark). Lane width matters
    // under ANSI mode: with the obvious 4x16-bit packing a LEGAL large doc
    // can overflow the packed long mid-aggregation (65535 shingles voting
    // into the 2^48 lane exceeds Long.Max) and kill the query with an
    // opaque ARITHMETIC_OVERFLOW. 21-bit lanes make the worst-case packed
    // sum at n = 2^21-1 shingles EXACTLY Long.Max, so aggregation can
    // never overflow below the guard bound and the per-doc guard (below)
    // is the single loud failure path.
    val packs: Seq[Column] = (0 until 22).map { q =>
      val lanes = (0 until 3).filter(c => 3 * q + c < 64).map { c =>
        val b = 3 * q + c // fingerprint bit: digit b/4, digit-bit b%4
        shiftright(col(s"d${b / 4}"), b % 4).bitwiseAND(lit(1L)) * lit(1L << (21 * c))
      }
      sum(lanes.reduce(_ + _)).as(s"p$q")
    }
    val n = count(lit(1)).as("n")
    // bit b is set iff ones(b) > n/2 (ties vote 0, bit clear). The fp is
    // carried as four 16-bit chunks c0..c3 (chunk k = bits 16k..16k+15),
    // keeping bucket keys and the hamming verify in small positive ints —
    // no int64 sign-bit gymnastics on either engine.
    def ones(b: Int): Column = shiftright(col(s"p${b / 3}"), 21 * (b % 3)).bitwiseAND(lit(0x1fffffL))
    // Lane-carry guard: a doc with more than 2^21-1 distinct shingles
    // would carry across its 21-bit vote lanes and corrupt neighboring bit
    // counts. Fail loudly instead (split oversize docs upstream). `n` is
    // counted independently of the packed sums, so the guard fires even if
    // lanes already carried. It rides the c0 expression (+0 when fine) so
    // Catalyst cannot prune it, and costs one comparison per DOCUMENT,
    // not per shingle.
    val laneGuard = when(
      col("n") > 0x1fffffL,
      raise_error(concat(
        lit("graft simhash: doc "), col("doc_id").cast("string"),
        lit(" has >2097151 distinct shingles; split it before simhash"))).cast("long"),
    ).otherwise(lit(0L))
    val chunks = (0 until 4).map { k =>
      val chunk = (0 until 16).map { j =>
        val b = 16 * k + j
        when(ones(b) * 2 > col("n"), lit(1L << j)).otherwise(0L)
      }.reduce(_ + _)
      (if (k == 0) chunk + laneGuard else chunk).as(s"c$k")
    }
    val sigs = withDigits
      .groupBy("doc_id")
      .agg(packs.head, (packs.tail :+ n): _*)
      .select(col("doc_id") +: chunks: _*)
    val buckets = sigs.select(
      col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
      posexplode(array(col("c0"), col("c1"), col("c2"), col("c3"))).as(Seq("chunk_idx", "chunk_key")))
    val hamming = (0 until 4)
      .map(k => bit_count(col(s"x.c$k").bitwiseXOR(col(s"y.c$k"))))
      .reduce(_ + _)
    buckets
      .as("x")
      .join(buckets.as("y"), Seq("chunk_idx", "chunk_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), hamming.cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** d06: near-dup cluster assignment — the dedup endgame: fold the
    * verified pair graph (d03's output) into connected components and
    * pick one keeper per component (the min doc_id). Min-label
    * propagation run TO A FIXPOINT: each round is a join + map-side-
    * combined min aggregate, and rounds repeat until no label changes,
    * so components of any diameter converge (a fixed round count would
    * silently mislabel a component whose diameter exceeds it). The
    * convergence check is a count over the label table — tiny, since
    * only docs that appear in some near-dup pair carry labels. The
    * oracle computes the same component-min labels via a recursive CTE,
    * so equality is fixpoint-vs-fixpoint, independent of round counts.
    * `maxRounds` caps propagation at a 50-hop component diameter as a
    * runaway bound: hitting it raises rather than returning unconverged
    * labels.
    */
  /** Strategy for cutting lineage between fixpoint rounds — iterative
    * algorithms must materialize each round's result or every round
    * re-plans (and re-executes) the whole upstream pipeline.
    */
  type LineageCut = DataFrame => DataFrame

  /** Executor-local blocks (lazy `localCheckpoint`): no distributed
    * filesystem round-trip, the right cut for local mode and short loops.
    * Tradeoff: an executor lost mid-loop loses its blocks and the job
    * restarts the loop from a truncated (unrecomputable) lineage — fine
    * single-JVM, wrong on a 1000-executor cluster.
    */
  val localCut: LineageCut = _.localCheckpoint(false)

  /** Reliable checkpoint to `SparkContext.setCheckpointDir`'s HDFS/S3
    * path: each round's labels survive executor loss, so a 100 TB
    * fixpoint resumes instead of restarting. This is the cluster-side
    * cut; callers must have set a checkpoint dir.
    */
  val reliableCut: LineageCut = _.checkpoint(false)

  def dedupClusters(spark: SparkSession, dir: String, maxRounds: Int = 50,
      cut: LineageCut = localCut): DataFrame = {
    // Cut lineage before looping: without the checkpoint every round
    // re-plans (and without exchange reuse, re-executes) the whole pair
    // pipeline — measured 463 Exchange nodes in the 4-round plan vs ~10
    // after. The cut is lazy: the pair list materializes once on first
    // execution, every round reads the materialized blocks — exactly how
    // you'd persist the edge list before iterating at 100 TB.
    val pairs = cut(minhashLsh(spark, dir).select(col("doc_a"), col("doc_b")))
    val labels = connectedComponents(pairs, maxRounds, cut)
    labels.select(col("doc_id"), col("label").as("cluster"), (col("doc_id") === col("label")).as("is_keeper"))
  }

  /** Min-label propagation to a fixpoint over an undirected edge list
    * `(doc_a, doc_b)` (already lineage-cut by the caller). Returns one
    * `(doc_id, label)` row per node with label = min node id in its
    * connected component.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50,
      cut: LineageCut = localCut): DataFrame = {
    // symmetric edges PLUS self-loops: each round is then a single
    // join + min-agg (labels referenced once per round, so plan size
    // grows linearly in rounds and the repeated edge subtree collapses
    // to one computation via exchange reuse). Self-loops come straight
    // off the pair endpoints — duplicates are free under min — so no
    // node-distinct shuffle exists anywhere (r17; it was a full
    // endpoint dedup that only fed this union).
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .union(pairs.select(col("doc_a"), col("doc_a").as("doc_b")))
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_b").as("doc_b")))
    def hop(labels: DataFrame): DataFrame = edges
      .join(labels.select(col("doc_id").as("doc_b"), col("label")), Seq("doc_b"))
      .groupBy(col("doc_a").as("doc_id"))
      .agg(min("label").as("label"))
    // Initial labels = one hop from the identity labeling, computed as a
    // direct aggregation (r17): hop(identity) is edges.groupBy(doc_a).
    // min(doc_b) — the identity join was a no-op lookup, and cutting at
    // the post-hop table drops one materialization + one distinct from
    // every call. Monotonicity is unchanged (labels only decrease), so
    // the double-hop fixpoint argument below still holds from this start.
    var labels  = cut(edges.groupBy(col("doc_a").as("doc_id")).agg(min("doc_b").as("label")))
    var changed = 1L
    var rounds  = 1
    while (changed > 0) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxRounds rounds (pathological component?)")
      // two hops per materialization: propagation is monotone (labels only
      // ever decrease), so next == labels across a DOUBLE hop still implies
      // a single-hop fixpoint — and the driver pays half the actions
      val next = cut(hop(hop(labels)))
      changed = next
        .join(labels.withColumnRenamed("label", "prev"), Seq("doc_id"))
        .filter(col("label") =!= col("prev"))
        .count()
      labels = next
      rounds += 2
    }
    labels
  }

  /** d13: QUALITY-canonical selection per near-dup cluster — the keep
    * rule that follows clustering in a real pipeline: within each d06
    * cluster keep the best document (here: most characters, ties to the
    * lowest doc_id), not blindly the lowest id. Expressed as two
    * aggregations instead of a window: per-cluster (count, max chars),
    * then the argmax re-join filtered to the max — both shuffles are
    * keyed by cluster, no per-cluster sort, no SinglePartition anywhere,
    * so the shape survives 100 TB clusters-of-millions unchanged.
    */
  def canonicalSelection(spark: SparkSession, dir: String): DataFrame = {
    val sized = dedupClusters(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
    val stats = sized.groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n_docs"), max("n_chars").cast("long").as("max_chars"))
    sized
      .join(stats, Seq("cluster"))
      .filter(col("n_chars").cast("long") === col("max_chars"))
      .groupBy(col("cluster"), col("n_docs"), col("max_chars"))
      .agg(min("doc_id").as("keeper"))
      .select(col("cluster"), col("keeper"), col("n_docs"), col("max_chars"))
  }

  /** d14: cross-source duplicate LEAKAGE matrix — which sources copy
    * from which: the verified near-dup pairs (d03's exact J >= 0.5 set)
    * joined to each side's source and counted per unordered source
    * pair. The diagnostic every multi-crawl corpus needs before
    * deciding source mixing weights (a source pair with heavy leakage
    * double-counts its content in the mixture). Two key-joins against
    * the tiny pair list + one grouped count — at 100 TB the pair list
    * is the dedup pipeline's existing artifact, so this is one cheap
    * derived aggregation.
    */
  def crossSourceLeakage(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    minhashLsh(spark, dir)
      .select("doc_a", "doc_b")
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
      .groupBy(
        least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** q50: the dedup end-product — the corpus view a training run actually
    * reads: documents surviving BOTH exact dedup (d01: only the min-doc_id
    * copy of each content hash) and near-dup clustering (d06: only each
    * cluster's keeper). Two key-joins against the tiny keeper/non-keeper
    * sets — at 100 TB the non-keeper list is the dedup pipeline's output
    * artifact, broadcast or bucket-joined against the corpus scan.
    */
  def dedupedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val exactKeepers = exact(spark, dir).select(col("keeper").as("doc_id"))
    val nearDupLosers = dedupClusters(spark, dir)
      .filter(!col("is_keeper"))
      .select("doc_id")
    docs
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** d07: incremental dedup — the shape dedup actually takes at 100 TB:
    * the corpus is deduped ONCE, and each new crawl batch is checked
    * against the existing index, paying cost proportional to the BATCH,
    * never re-shuffling the corpus. The stand-in batch boundary is the
    * source column (`newSources` = today's crawl).
    *
    * Verdict ladder per new doc: `exact_dup` (content hash already in the
    * corpus hash index) > `near_dup` (word-5-shingle Jaccard >= threshold
    * against some corpus doc) > `novel`. The near-dup check joins the new
    * batch's postings against corpus postings FIRST SEMI-JOINED to the
    * batch's gram set — the corpus side shrinks to grams the batch
    * actually mentions before any wide join, so corpus-side cost is an
    * index lookup, not a scan-shuffle. Corpus doc sizes (the Jaccard
    * denominator) are computed only for candidate docs, as in d03. Best
    * match = highest Jaccard, ties to the lowest corpus doc_id.
    */
  def incrementalDedup(
      spark: SparkSession,
      dir: String,
      newSources: Seq[String] = Seq("src18", "src19"),
      threshold: Double = 0.5,
  ): DataFrame = {
    val docs    = Tables.documents(spark, dir)
    val isNew   = col("source").isin(newSources: _*)
    val newDocs = docs.filter(isNew)
    val corpus  = docs.filter(!isNew)
    verdictsAgainstIndex(newDocs, corpusHashIndex(corpus), corpusPostings(corpus), threshold)
  }

  /** The standing corpus's exact-tier index — one row per distinct
    * content hash (at scale, the persisted artifact of the corpus's own
    * d01 pass, republished as the corpus grows).
    */
  def corpusHashIndex(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("exact_match"))

  /** The standing corpus's near-tier postings index: distinct (doc_id,
    * 5-shingle hash) rows — the other persisted artifact d07-class
    * checks probe.
    */
  def corpusPostings(corpus: DataFrame): DataFrame =
    Shingles.shingleRows(corpus, 5)
      .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
      .distinct()

  /** The d07 verdict ladder against a PRECOMPUTED corpus index — the
    * shared core of [[incrementalDedup]] (which derives the index from
    * the corpus split) and [[graft.streaming.CurationStream]]'s live
    * tier (which re-resolves a PUBLISHED index per micro-batch): both
    * paths produce identical verdicts by construction, the parity the
    * streaming spec pins. Cost ∝ the new batch: the corpus side is
    * semi-joined down to grams the batch actually mentions before any
    * wide join.
    */
  def verdictsAgainstIndex(
      newDocs: DataFrame,
      corpusHashes: DataFrame,
      corpusPost: DataFrame,
      threshold: Double = 0.5,
  ): DataFrame = {
    val exactHits = newDocs
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .join(corpusHashes, Seq("content_hash"))
      .select(col("doc_id"), col("exact_match"))
    // near tier: batch postings vs corpus postings restricted to the
    // batch's grams (left_semi BEFORE the join — the incremental bound)
    val newPost = Shingles.shingleRows(newDocs, 5)
      .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
      .distinct()
    val touched = corpusPost.join(newPost.select("g").distinct(), Seq("g"), "left_semi")
    val overlap = newPost
      .as("x")
      .join(touched.as("y"), Seq("g"))
      .groupBy(col("x.doc_id").as("doc_id"), col("y.doc_id").as("corpus_doc"))
      .agg(count(lit(1)).as("common"))
    val newSizes = newPost.groupBy("doc_id").agg(count(lit(1)).as("n_a"))
    val corpusSizes = corpusPost
      .join(overlap.select(col("corpus_doc").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_b"))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("jaccard").desc, col("corpus_doc"))
    val nearHits = overlap
      .join(newSizes, Seq("doc_id"))
      .join(corpusSizes.withColumnRenamed("doc_id", "corpus_doc"), Seq("corpus_doc"))
      .withColumn("jaccard", col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("corpus_doc").as("near_match"), col("jaccard"))
    newDocs
      .select(col("doc_id"))
      .join(exactHits, Seq("doc_id"), "left")
      .join(nearHits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("exact_match").isNotNull, "exact_dup")
          .when(col("near_match").isNotNull, "near_dup")
          .otherwise("novel")
          .as("verdict"),
        coalesce(col("exact_match"), col("near_match")).as("match_doc"),
        when(col("exact_match").isNull, round(col("jaccard"), 4)).as("jaccard"),
      )
  }

  /** d05: embedding-cosine near-dup — random-hyperplane LSH buckets,
    * exact cosine verification inside buckets only. Default threshold is
    * calibrated to this corpus: the synthetic embeddings are
    * near-isotropic (max pairwise cosine ~0.51), so a real-world 0.8+
    * threshold would select nothing; 0.25 marks the top ~0.1%
    * most-similar pairs.
    *
    * SCALE GUARDS (in-bucket verify is all-pairs, so bucket size is the
    * whole cost model — see [[Similarity.autoPlanes]] for the rule):
    *  - `numPlanes0 = 0` sizes the plane count from the corpus so the
    *    EXPECTED bucket stays ~1k vectors at any n (callers needing
    *    DuckDB-oracle parity pin 8, identical to auto for n <= 256k);
    *  - `maxBucket` is a hard cap on the REALIZED bucket: a skewed bucket
    *    (mass at one pole of the hyperplanes) larger than the cap kills
    *    the job with a `raise_error` naming the bucket, instead of
    *    silently going quadratic — resize planes or pre-split the bucket.
    */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.25,
      numPlanes0: Int = 0, maxBucket: Long = 100000L): DataFrame = {
    import graft.functions.VectorFunctions.{dot, l2Norm}
    val numPlanes =
      if (numPlanes0 > 0) numPlanes0 else Similarity.autoPlanes(Tables.embeddings(spark, dir).count())
    // Norms computed once per vector, not once per pair (a pairwise
    // cosine() would evaluate three dot products per candidate).
    val bucketed = Similarity
      .withHyperplaneBucket(Tables.embeddings(spark, dir), numPlanes)
      .withColumn("norm", l2Norm(col("embedding")))
    // Realized-bucket-size guard: <= 2^planes count rows, map-side
    // combined, broadcast back; the raise_error lives in a filter so
    // column pruning can never drop it.
    val counts = bucketed.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
    val a = bucketed
      .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("norm").as("norm_a"), col("bucket"))
      .join(broadcast(counts), Seq("bucket"))
      .filter(
        when(col("bucket_n") > maxBucket,
          raise_error(concat(
            lit(s"d05: LSH bucket "), col("bucket"),
            lit(s" holds "), col("bucket_n"),
            lit(s" vectors (cap $maxBucket) — in-bucket verify would go quadratic; " +
              s"raise numPlanes (currently $numPlanes) or pre-split the bucket"))))
          .otherwise(lit(true)))
      .drop("bucket_n")
    val b = bucketed.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("norm").as("norm_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 4).as("cosine"))
  }

  /** d11: Unicode-robust exact dedup — d01's weakness made measurable
    * and fixed. The same visible string in composed (NFC) and
    * decomposed (NFD) spelling hashes to DIFFERENT raw md5s, so a
    * byte-level deduper keeps both copies; keying on
    * `md5(graft_normalize(text))` collapses them. The query plants the
    * t12 mixed-script variants (two of which are the same accented
    * string in NFC vs NFD spelling) and groups by normalized hash:
    * the accent group shows `n_spellings = 2` collapsing into one
    * keeper — `n_raw` distinct byte-hashes would have leaked a
    * duplicate. Same shuffle shape as d01 (one combine on the hash);
    * normalization is a scan projection.
    */
  def unicodeDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.normalized
    val variants = array(TextAnalysis.mixedScriptVariants.map(lit): _*)
    Tables
      .documents(spark, dir)
      .select(col("doc_id"),
        element_at(variants, (pmod(col("doc_id"), lit(6)) + 1).cast("int")).as("s"))
      .select(col("doc_id"), md5(normalized(col("s"))).as("norm_hash"), md5(col("s")).as("raw_hash"))
      .groupBy("norm_hash")
      .agg(
        count(lit(1)).as("n_copies"),
        countDistinct(col("raw_hash")).as("n_spellings"),
        min("doc_id").as("keeper"))
  }

  /** d17: near-dup THRESHOLD sensitivity sweep — the tuning table every
    * dedup deployment reads before committing to a Jaccard cutoff: from
    * ONE pair-overlap computation (d02's rare-gram postings — the
    * expensive part is paid once), how many pairs and how many touched
    * docs survive at each candidate threshold (30%…90%). The cliff in
    * this table IS the threshold decision: below it boilerplate-ish
    * pairs flood in, above it true near-dups start escaping. The
    * per-pair Jaccard fans out over the 7-row threshold literal (a
    * ×7 map on the PAIR table, which is candidate-bounded — never a
    * recompute of the overlap); thresholds that catch nothing still
    * report 0 via the left joins.
    */
  def thresholdSweep(spark: SparkSession, dir: String, maxDf: Int = 100): DataFrame = {
    import spark.implicits._
    val docs  = Shingles.hashedShingleSets(Tables.documents(spark, dir), 3)
    val sizes = docs.select(col("doc_id"), size(col("grams")).as("n"))
    val exploded = docs.select(col("doc_id"), explode(col("grams")).as("g"))
    val rare = exploded.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
    val pairs = {
      val postings = exploded.join(rare.select("g"), Seq("g"), "left_semi")
      postings.as("x")
        .join(postings.as("y"), Seq("g"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("common"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
        .withColumn("jaccard",
          col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
        // r16 note: a lazy cut here was tried and REVERTED — the two
        // sweep legs share every exchange of the pair pipeline
        // (ReusedExchange), so the duplication they pay is only the
        // pair-table-sized tail, and the cut's materialization cost
        // measured as a consistent ~10% loss
    }
    val ths = Seq(30L, 40L, 50L, 60L, 70L, 80L, 90L)
    val swept = pairs
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(array(ths.map(lit(_)): _*)).as("threshold_pct"))
      .filter(col("jaccard") * 100 >= col("threshold_pct"))
    val nPairs = swept.groupBy("threshold_pct").agg(count(lit(1)).as("n_pairs"))
    val nDocs = swept
      .select(col("threshold_pct"), explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy("threshold_pct")
      .agg(countDistinct(col("d")).as("n_docs"))
    ths.toDF("threshold_pct")
      .join(nPairs, Seq("threshold_pct"), "left")
      .join(nDocs, Seq("threshold_pct"), "left")
      .select(col("threshold_pct"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }

  /** d15: EXACT SUBSTRING dedup (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" operator) — flag every
    * verbatim `w`-token span a document shares with ANOTHER document, and
    * report how much of each document is covered by such spans. This is
    * the span-level complement of d02's whole-document Jaccard: a doc
    * that quotes one paragraph from the corpus scores near-zero Jaccard
    * but a high dup-token fraction here, and it's the spans (not the doc
    * pair) a training pipeline cuts.
    *
    * Spark-first shape — the suffix-array of the paper is a single-node
    * construction; the distributed equivalent is the windowed posting
    * list, and it's all narrow scans + two keyed aggregates:
    *   1. `posexplode(graft_shingles(text, w))` — every w-token window
    *      with its position, one O(L) codegen pass per doc, no shuffle.
    *   2. duplicated grams = groupBy(gram).count(DISTINCT doc) >= 2 —
    *      map-side-combined partial distinct, the d02 posting shuffle.
    *   3. LEFT SEMI join windows -> duplicated grams: each window keeps
    *      or drops independently, so a boilerplate gram with df=10^6
    *      cannot fan out (nothing here is postings x postings).
    *   4. per-doc coverage = interval union of [pos, pos+w-1] via an
    *      `aggregate()` fold over the doc's SORTED dup positions — state
    *      is O(dup windows of that doc), bounded by doc length, the same
    *      bound as holding the document row itself.
    * Exact integers end to end; `dup_frac` is one int/int double division
    * (bit-identical cross-engine, no rounding). The DuckDB oracle
    * recomputes coverage by the OTHER formulation — COUNT(DISTINCT
    * covered position) — so the interval fold is verified against an
    * independent algorithm, not replayed.
    */
  def substringDedup(spark: SparkSession, dir: String, w: Int = 8): DataFrame =
    substringDedupDocs(Tables.documents(spark, dir).select(col("doc_id"), col("text")), w)

  /** [[substringDedup]]'s core over any `(doc_id, text)` frame. */
  def substringDedupDocs(docsIn: DataFrame, w: Int): DataFrame = {
    val docs = docsIn.select(col("doc_id"), col("text"))
    val wins = docs.select(col("doc_id"),
      posexplode(expr(s"graft_shingles(text, $w)")).as(Seq("pos", "g")))
    // r17 (d16's rewrite, same shape): dup-gram detection as ONE
    // gram-partitioned window instead of groupBy(g) + left-semi re-join —
    // the join recomputed the shingle explode (the dominant CPU) and
    // shuffled the postings on g twice. "held by >= 2 distinct docs" ⟺
    // min(doc_id) ≠ max(doc_id) over the gram's postings (countDistinct
    // needs only the extremes); every occurrence of a dup gram survives,
    // exactly the semi-join's row set (guide §2.4).
    val wg = Window.partitionBy("g")
    val dupWins = wins
      .withColumn("mn", min("doc_id").over(wg))
      .withColumn("mx", max("doc_id").over(wg))
      .filter(col("mx") =!= col("mn"))
      .select(col("doc_id"), col("pos"))
    val perDoc = dupWins.groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"),
        sort_array(collect_list(col("pos").cast("long"))).as("ps"))
      .select(col("doc_id"), col("n_dup_windows"),
        expr(s"""aggregate(ps,
            named_struct('last', CAST(-1 AS BIGINT), 'cov', CAST(0 AS BIGINT)),
            (acc, s) -> named_struct(
              'last', greatest(acc.last, s + ${w - 1}),
              'cov',  acc.cov + greatest(CAST(0 AS BIGINT),
                        s + $w - greatest(s, acc.last + 1))),
            acc -> acc.cov)""").as("dup_tokens"))
    val sizes = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    perDoc
      .join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_dup_windows"),
        col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens").cast("double")).as("dup_frac"))
  }

  /** d16: substring-dedup REWRITE — the "apply" half of d15 (Lee et al.
    * 2022 actually SHIP the cleaned corpus, not the coverage report):
    * every duplicated `w`-token span keeps its occurrence in the OWNER
    * document (min doc_id over the gram's holders — deterministic,
    * order-free) and is cut from every other document; each survivor's
    * text is reassembled from its kept tokens in order. Output per doc:
    * exact token accounting + the cleaned text itself, the thing the
    * next pipeline stage trains on.
    *
    * Scale shape: d15's windowed posting list end to end (posexplode of
    * the native shingle kernel, gram-keyed owner aggregate, LEFT ANTI of
    * the token stream against the exploded coverage — nothing is
    * postings×postings); the one new piece is reassembly, a doc-keyed
    * `collect_list(struct(pos, token))` + `array_sort` fold whose state
    * is the document's own tokens — the same bound as holding the row.
    * The oracle rebuilds the text with `string_agg(… ORDER BY p)` — an
    * independent ordered-concat implementation, so the sort+transform
    * reassembly is cross-checked, not replayed.
    */
  def substringRewrite(spark: SparkSession, dir: String, w: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val wins = docs.select(col("doc_id"),
      posexplode(expr(s"graft_shingles(text, $w)")).as(Seq("pos", "g")))
    // r17: owner/dup detection is ONE gram-partitioned window over the
    // posting list instead of groupBy(g) + re-join(g) — the join shape
    // recomputed the shingle explode (the operator's dominant CPU) and
    // shuffled the postings on g TWICE. owner = min(doc_id) over g, and
    // "held by >= 2 distinct docs" ⟺ min(doc_id) ≠ max(doc_id) over g
    // (countDistinct >= 2 needs only the extremes). Same shuffle key,
    // half the explodes, no gram-keyed join at all (guide §2.4).
    val wg = Window.partitionBy("g")
    val covered = wins
      .withColumn("owner", min("doc_id").over(wg))
      .withColumn("mx", max("doc_id").over(wg))
      .filter(col("mx") =!= col("owner") && col("doc_id") =!= col("owner"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("p"))
      .distinct()
    val toks = docs.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("p", "tk")))
    // r17: one row-preserving LEFT join replaces the anti-join + a
    // separate docs-side n_tokens scan + the final doc-keyed join:
    // `covered` is distinct on (doc_id, p) so the left join fans out
    // nothing, n_tokens = the group's row count, kept = the uncovered
    // rows, and collect_list skips the nulls the `when` leaves on
    // covered tokens. documents is scanned twice total (was 4×), the
    // doc-keyed joins are gone (guide §2 shuffle volume, §3).
    toks
      .join(covered.withColumn("cut", lit(1)), Seq("doc_id", "p"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("cut").isNull, 1)).as("kept_tokens"),
        array_join(
          transform(
            array_sort(collect_list(when(col("cut").isNull, struct(col("p"), col("tk"))))),
            x => x.getField("tk")),
          " ").as("clean_text"))
      .select(col("doc_id"), col("n_tokens"), col("kept_tokens"),
        (col("n_tokens") - col("kept_tokens")).as("removed_tokens"),
        col("clean_text"))
  }
}
