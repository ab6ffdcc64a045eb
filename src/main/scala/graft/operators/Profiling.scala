package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data profiling + drift/monitoring analytics (SURVEY.md §2, r13 tier).
  *
  * The operability layer around a changefeed deployment: before trusting a
  * table you PROFILE it, before trusting a mix you test INDEPENDENCE, and a
  * live feed is watched with SNAPSHOT DIFFS and CUSUM drift alarms. All four
  * stay in exact integer fixed point across the oracle boundary (the q94/q100
  * DECIMAL-DIV discipline) so the hash compare is bit-stable.
  */
object Profiling {

  /** q125: column profiler over `orders` — the `SUMMARIZE` /
    * `DESCRIBE PROFILE` verb every engine grows. Per column: non-null
    * count, exact distinct count, min/max. Numeric min/max are emitted
    * in exact integer units (raw longs for keys, e4 micro-units for
    * money, epoch-µs for timestamps), lexical min/max for strings — no
    * float crosses rows.
    *
    * Scale (r16 shape): one TWO-LEVEL fold per column — groupBy(value)
    * count (map-side combined; the shuffle carries one row per distinct
    * value), then a one-row fold of that value table — six independent
    * column-pruned subplans unioned. Total bytes read equal the old
    * single wide pass (each subplan scans exactly its column), but
    * there is no Expand(×7) row blowup and no partial aggregate keyed
    * on (gid × every column) — the shape that made exact multi-distinct
    * the fleet's most expensive aggregate (the sketch alternative
    * remains q19's HLL profile). No SinglePartition touches table-sized
    * data; the global folds run over value tables.
    */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // r16 restructure (same rows, oracle-verified): the six exact
    // distincts used to ride ONE Expand(×7) pass whose partial hash
    // aggregate keyed on (gid, every column) — a half-million-group
    // serial fold on the single-file test corpus and a ×7 row blowup at
    // any scale. Now each column is its own TWO-LEVEL fold: groupBy
    // value (map-side combined; the shuffle carries one row per
    // distinct value) then a one-row global fold of that value table.
    // Column pruning makes the six passes read the SAME total bytes as
    // the one wide pass, there is no Expand, each per-column fold's
    // state is one column narrow, and the six subplans are independent
    // stages the scheduler overlaps. Min/max transforms commute with
    // the fold exactly as before (monotone e4 / epoch-µs maps).
    def vals(c: String) =
      o.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
    def base(c: String) = Seq(
      coalesce(sum("cnt"), lit(0L)).as("n_rows"),
      coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
      count(when(col("v").isNotNull, lit(1))).as("n_distinct"))
    def numProf(c: String, lo: Column, hi: Column) =
      vals(c).agg(base(c).head, (base(c).tail :+ lo.as("min_num") :+ hi.as("max_num")): _*)
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
          col("min_num").cast("long"), col("max_num").cast("long"),
          lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
    def strProf(c: String) =
      vals(c).agg(base(c).head, (base(c).tail :+ min("v").as("ms") :+ max("v").as("mxs")): _*)
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
          lit(null).cast("bigint").as("min_num"), lit(null).cast("bigint").as("max_num"),
          col("ms").as("min_str"), col("mxs").as("max_str"))
    numProf("o_orderkey", min("v"), max("v"))
      .unionByName(numProf("o_custkey", min("v"), max("v")))
      .unionByName(strProf("o_orderstatus"))
      .unionByName(numProf("o_totalprice",
        round(min("v") * 10000), round(max("v") * 10000)))
      .unionByName(numProf("o_orderdate",
        min(unix_micros(col("v").cast("timestamp"))),
        max(unix_micros(col("v").cast("timestamp")))))
      .unionByName(strProf("o_orderpriority"))
  }

  /** q126: lang × source contingency table with exact chi-square-of-
    * independence contributions over `documents` — the statistical mix
    * audit behind q103's entropy view ("is language independent of source,
    * or does one source own a language?"). Each cell carries its observed
    * count, expected count under independence (e6 fixed point), and
    * chi-square contribution in ppm: (o·N − r·c)² · 10⁶ DIV (r·c·N), all in
    * DECIMAL(38,0) cross-multiplies (exact to ~sf100: (N²)²·10⁶ < 10³⁸).
    *
    * Scale: one groupBy over the scan builds the cell table; marginals are
    * re-aggregates of the TINY cell table (|langs|×|sources|), broadcast
    * back — the fact table is touched once, everything downstream is
    * dimension-sized.
    */
  def contingencyChiSq(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir).groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val langM = cells.groupBy("lang").agg(sum("o").as("r"))
    val srcM  = cells.groupBy("source").agg(sum("o").as("c"))
    val tot   = cells.agg(sum("o").as("n"))
    cells
      .join(broadcast(langM), "lang")
      .join(broadcast(srcM), "source")
      .crossJoin(broadcast(tot))
      .select(
        col("lang"), col("source"), col("o").as("n_obs"),
        expr("CAST(CAST(r AS DECIMAL(38,0)) * c * 1000000 DIV n AS BIGINT)").as("expected_e6"),
        expr("""CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
               |  * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
               |  * 1000000 DIV (CAST(r AS DECIMAL(38,0)) * c * n) AS BIGINT)""".stripMargin)
          .as("chi2_ppm"))
  }

  /** q127: snapshot DIFF as a changefeed — materialize the keyed state "each
    * user's latest event inside a trailing 1-day window" at two instants
    * (2024-01-15, 2024-01-30) and emit the I/U/D delta feed that replays one
    * into the other. This is the reconciliation primitive behind every CDC
    * deployment: diff two snapshots, get the feed you missed.
    *
    * Per-key latest = max over a (ts_us, event_id, payload…) struct —
    * lexicographic struct ordering with the unique event_id as tiebreak, so
    * the winner is deterministic and the payload rides along in the same
    * aggregate (no join-back). Deletes carry the t1 payload being retired;
    * inserts/updates carry the t2 payload.
    *
    * Scale: two filtered scans (partition-prunable on a date-partitioned
    * feed), each collapsing to per-user state via one hash aggregate; the
    * diff is a key-partitioned full-outer join of two user-sized tables.
    */
  def snapshotDiffChangefeed(spark: SparkSession, dir: String): DataFrame = {
    def snap(tEnd: String): DataFrame =
      Tables.events(spark, dir)
        .filter(col("ts") > lit(tEnd).cast("timestamp") - expr("INTERVAL 1 DAY")
          && col("ts") <= lit(tEnd).cast("timestamp"))
        .groupBy("user_id")
        .agg(max(struct(
          unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          col("event_type"),
          round(col("value") * 10000).cast("long").as("value_e4"))).as("p"))
    val s1 = snap("2024-01-15").withColumnRenamed("p", "p1")
    val s2 = snap("2024-01-30").withColumnRenamed("p", "p2")
    s1.join(s2, Seq("user_id"), "full_outer")
      .filter(col("p1").isNull || col("p2").isNull || col("p1") =!= col("p2"))
      .select(
        col("user_id"),
        when(col("p1").isNull, "I").when(col("p2").isNull, "D").otherwise("U").as("op"),
        coalesce(col("p2.event_type"), col("p1.event_type")).as("event_type"),
        coalesce(col("p2.value_e4"), col("p1.value_e4")).as("value_e4"),
        coalesce(col("p2.ts_us"), col("p1.ts_us")).as("ts_us"))
  }

  /** q128: CUSUM changepoint/drift detection per event_type — the classic
    * sequential monitoring statistic (Page 1954) a realtime feed is watched
    * with. One-sided CUSUM S_i = max(0, S_{i−1} + x_i − μ − k) has the exact
    * closed form S_i = P_i − min(0, min_{j≤i} P_j) over the prefix sums P of
    * the slack-adjusted deviations — which turns the sequential fold into
    * prefix sums + prefix mins, both decomposable with the q12 banded
    * discipline (no SinglePartition window anywhere):
    *
    *  1. per-(type, day-band) in-band prefix sum AND in-band prefix min
    *     under one partitioned window;
    *  2. band totals/mins → exclusive band offsets and exclusive prior-band
    *     mins via two triangular broadcast self-joins over the tiny band
    *     table (bands grow with the calendar, not the data);
    *  3. global P = offset + in-band prefix; global running min =
    *     least(prior-band min, offset + in-band prefix min); alarm when
    *     S = P − min(0, runmin) exceeds h.
    *
    * Everything is exact e4 integer arithmetic (μ via an offset-shifted DIV —
    * `(sum + B·n) DIV n − B` with B = 1e9 e4-units keeps the numerator
    * positive for any mean ≥ −1e5, where Spark's truncating DIV and DuckDB's
    * flooring // agree; the q141 pattern, so user-supplied events tables with
    * negative values stay engine-free), so regrouping the additions is
    * associativity-safe and the oracle's single sequential window agrees
    * bit-for-bit. k = 10 units, h = 200 units (~0.2σ slack, ~4σ threshold on
    * this feed) — alarm counts are non-trivial at every test SF.
    */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(spark, dir).select(
      col("event_type"), col("ts"), col("event_id"),
      round(col("value") * 10000).cast("long").as("v4"),
      date_format(col("ts"), "yyyy-MM-dd").as("band"))
    val mean = v.groupBy("event_type").agg(
      expr("(sum(v4) + 1000000000 * count(1)) DIV count(1) - 1000000000").as("mean4"))
    val wIn = Window.partitionBy("event_type", "band").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = v.join(broadcast(mean), "event_type")
      .withColumn("d", col("v4") - col("mean4") - lit(100000L))
      .withColumn("pfIn", sum("d").over(wIn))
      .withColumn("minIn", min(col("pfIn")).over(wIn))
    // tiny per-(type, band) table: total + full-band min of the in-band prefix
    val bands = dev.groupBy("event_type", "band")
      .agg(sum("d").as("btot"), min("pfIn").as("bmin"))
    val offsets = bands.as("a")
      .join(broadcast(bands.as("b")),
        col("b.event_type") === col("a.event_type") && col("b.band") < col("a.band"), "left")
      .groupBy(col("a.event_type").as("event_type"), col("a.band").as("band"),
        col("a.bmin").as("bmin"))
      .agg(coalesce(sum(col("b.btot")), lit(0L)).as("off"))
    val bandPfMin = offsets.select(col("event_type"), col("band"),
      col("off"), (col("off") + col("bmin")).as("globalBandMin"))
    val prior = bandPfMin.as("a")
      .join(broadcast(bandPfMin.as("b")),
        col("b.event_type") === col("a.event_type") && col("b.band") < col("a.band"), "left")
      .groupBy(col("a.event_type").as("event_type"), col("a.band").as("band"),
        col("a.off").as("off"))
      .agg(min(col("b.globalBandMin")).as("priorMin"))
    dev
      .join(broadcast(prior), Seq("event_type", "band"))
      .withColumn("p", col("off") + col("pfIn"))
      .withColumn("runmin",
        least(coalesce(col("priorMin"), lit(Long.MaxValue)), col("off") + col("minIn")))
      .withColumn("s", col("p") - least(lit(0L), col("runmin")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        max("s").as("max_cusum_e4"),
        sum(when(col("s") > 2000000L, 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("s") > 2000000L, unix_micros(col("ts")))).as("first_alarm_us"))
  }

  /** q136: PSI (population stability index) feature-drift profile — the
    * standard ML-monitoring answer to "did this feature's DISTRIBUTION
    * move between the reference window and now?" (q128 watches the level;
    * PSI watches the shape; t17 is the text analogue). Reference = events
    * before 2024-01-15, current = after; `value` banded into equal-width
    * 10-unit buckets (tail lumped at 15+ — the q69 equi-width discipline;
    * equal-width keeps the edges engine-free where reference deciles
    * would drag in a rank pass).
    *
    * Exactness: per-bucket counts are integers; the log-ratio
    * ln(p_i/q_i) = ln((nr_i·nc)/(nc_i·nr)) has INTEGERS inside the ln, so
    * one round(1e6·ln(·)) per bucket is the entire float surface (the
    * t17/q103 micro-nat discipline); zero-count buckets smooth to 1
    * (documented, deterministic — the standard PSI ε-clip made integer).
    * The PSI number itself is Σ (p−q)·lr — the spec folds it from these
    * exact per-bucket rows; the hashed artifact stays integer.
    *
    * Scale: one scan, one bounded-key aggregate (≤16 buckets), a 1-row
    * totals broadcast. Nothing here grows with data volume but the scan.
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val banded = Tables.events(spark, dir).select(
      when(col("ts") < lit("2024-01-15").cast("timestamp"), "ref").otherwise("cur").as("win"),
      // greatest(…,0) both clamps the tail AND makes the bucketing engine-free
      // for negative values: Spark DIV truncates toward zero while DuckDB //
      // floors, but every negative v4 lands ≤0 in both, so the clamp erases
      // the discrepancy (r13 advice — Tables.scala admits user-supplied events).
      least(greatest(expr("CAST(round(value * 10000) AS BIGINT) DIV 100000"), lit(0L)),
        lit(15L)).as("bucket"))
    val cells = banded.groupBy("bucket").pivot("win", Seq("ref", "cur"))
      .agg(count(lit(1)))
      .select(col("bucket"),
        coalesce(col("ref"), lit(0L)).as("n_ref"),
        coalesce(col("cur"), lit(0L)).as("n_cur"))
    val tot = cells.agg(sum("n_ref").as("nr"), sum("n_cur").as("nc"))
    cells.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(lit(1e6) * log(
          (greatest(col("n_ref"), lit(1L)) * col("nc")).cast("double") /
            (greatest(col("n_cur"), lit(1L)) * col("nr")).cast("double")))
          .cast("long").as("logratio_e6"))
  }

  /** q133: per-partition TABLE DIGEST — the anti-entropy primitive a
    * replicated changefeed deployment runs to answer "do these two copies
    * of the table hold the same rows?" without shipping rows: an
    * ORDER-INDEPENDENT checksum per partition (month of l_shipdate),
    * comparable replica-to-replica at partition granularity so divergence
    * localizes to the partitions whose digests differ.
    *
    * Two complementary folds per partition, both commutative/associative
    * (hence shuffle- and file-order-free, and map-side combinable):
    * XOR of per-row 60-bit hashes (cheap; blind to duplicate PAIRS of an
    * identical row) and the SUM of the same hashes mod 2⁶¹ (catches what
    * XOR cancels), plus the row count. The row hash is hex digits 1–15
    * of md5 over a '|'-joined canonical rendering — every numeric is cast
    * to an exact integer unit BEFORE rendering (doubles never render).
    *
    * Scale: one scan, one tiny aggregate; digests are mergeable upward
    * (partition → table) by the same folds over the digest table.
    */
  def tableDigest(spark: SparkSession, dir: String): DataFrame = {
    val canon = concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
      round(col("l_quantity")).cast("long"),
      round(col("l_extendedprice") * 100).cast("long"),
      round(col("l_discount") * 100).cast("long"),
      col("l_returnflag"), col("l_linestatus"),
      date_format(col("l_shipdate"), "yyyy-MM-dd"))
    Tables.lineitem(spark, dir)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("part"),
        conv(substring(md5(canon), 1, 15), 16, 10).cast("long").as("rh"))
      .groupBy("part")
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(rh)").as("xor_digest"),
        expr("CAST(sum(CAST(rh AS DECIMAL(38,0))) % 2305843009213693952 AS BIGINT)")
          .as("sum_digest"))
  }
}
