package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mergeable sketch columns (SURVEY.md §2 #105) — the sketch ALGEBRA, not
  * just sketch answers (q19 covers those): per-shard HLL (distinct users)
  * and KLL (value quantiles) sketches persisted as binary columns, with
  * any rollup computed by UNIONING stored sketches instead of recounting
  * raw rows.
  *
  * This is the structure that makes incremental analytics work at 100 TB:
  * a day's partition closes with a KB-sized sketch row; all-time,
  * trailing-window, and cross-partition rollups then read sketch rows
  * (bytes ∝ shards), never raw data. It's also the changefeed story for
  * approximate aggregates — a materialized sketch view folds each batch's
  * sketch into the running one with the same union.
  */
object Sketches {

  /** The stored per-shard artifact: one row per (event_type, day) with an
    * HLL sketch of user_ids and a KLL sketch of values. Both aggregates
    * get map-side partial combine (sketches merge associatively —
    * that's the point).
    */
  def dailySketches(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        hll_sketch_agg(col("user_id")).as("user_hll"),
        kll_sketch_agg_double(col("value")).as("value_kll"),
      )

  /** Rollup FROM STORED SKETCHES: distinct users and p50/p90 per
    * event_type, touching only the sketch rows.
    */
  def rollupFromSketches(daily: DataFrame): DataFrame =
    daily
      .groupBy("event_type")
      .agg(
        hll_union_agg(col("user_hll")).as("user_hll"),
        kll_merge_agg_double(col("value_kll")).as("value_kll"),
      )
      .select(
        col("event_type"),
        hll_sketch_estimate(col("user_hll")).as("approx_users"),
        kll_sketch_get_quantile_double(col("value_kll"), lit(0.5)).as("p50_sketch"),
        kll_sketch_get_quantile_double(col("value_kll"), lit(0.9)).as("p90_sketch"),
      )

  /** q59 driver entry (rows-only: Datasketches estimates have no DuckDB
    * twin — the spec asserts union≈direct≈exact instead): the all-time
    * rollup computed purely from stored daily sketches.
    */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame =
    rollupFromSketches(dailySketches(spark, dir)).orderBy("event_type")

  /** The same answers sketched directly over the whole corpus — the
    * reference for the union-equals-whole property.
    */
  def directSketches(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("event_type")
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"),
        kll_sketch_get_quantile_double(kll_sketch_agg_double(col("value")), lit(0.5)).as("p50_sketch"),
        kll_sketch_get_quantile_double(kll_sketch_agg_double(col("value")), lit(0.9)).as("p90_sketch"),
      )

  /** q129: audience OVERLAP estimation via KMV / bottom-k (theta-sketch
    * class) signatures — the set-INTERSECTION question HLL cannot answer
    * (HLL unions; intersection needs inclusion–exclusion with compounding
    * error, the reason theta sketches exist). For every unordered pair of
    * event types: estimated Jaccard of their user audiences from k=128
    * minimum md5 values per set, against the exact Jaccard as the audit
    * (the s10 recall-audit discipline applied to sketches).
    *
    * Bottom-k is DETERMINISTIC (k smallest values of a fixed hash — no
    * RNG), hence the rare sketch with an EXACT oracle: DuckDB replays the
    * same k-min selection bit-for-bit. Estimator: merge both sketches,
    * keep the k smallest distinct hashes of the union (θ implicit at the
    * k-th), count how many of those live in BOTH sets → jaccard ≈
    * matched/k (Broder 1997 bottom-k minwise estimate, exact-integer ppm).
    *
    * Scale: per-type signatures are k-row aggregates of ONE distinct
    * (type,user) fold — the pair stage touches 5k·types rows, never the
    * fact table; the exact audit is the expensive leg (type-pair
    * self-join over per-user type sets) and is output-bounded by
    * users × (types-per-user choose 2), types ≤ 5 here. At 100 TB you
    * ship only the signatures.
    */
  def kmvOverlap(spark: SparkSession, dir: String, k: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one distinct (event_type, user) fold; h = md5 of the user id
    val ut = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("h", md5(col("user_id").cast("string")))
    // per-type KMV signature: the k lexicographically-smallest hashes
    val sig = ut
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("h"))
    // pairwise: tag each signature with every unordered pair it belongs
    // to (pair list = tiny type×type cross), merge, keep the union's k
    // smallest distinct hashes, count members present in both — the
    // whole stage touches pairs × 2k rows, never the fact table
    val types = sig.select(col("event_type")).distinct()
    val pairs = types.as("a").join(broadcast(types.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
    val sigA = sig.select(col("event_type").as("ta"), col("h"))
    val sigB = sig.select(col("event_type").as("tb"), col("h"))
    val unioned = broadcast(pairs).join(sigA, Seq("ta")).select(col("ta"), col("tb"), col("h"))
      .union(broadcast(pairs).join(sigB, Seq("tb")).select(col("ta"), col("tb"), col("h")))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("ta", "tb").orderBy("h")))
      .filter(col("rn") <= k)
    val est = unioned
      .join(sigA.withColumn("ina", lit(1L)), Seq("ta", "h"), "left")
      .join(sigB.withColumn("inb", lit(1L)), Seq("tb", "h"), "left")
      .groupBy("ta", "tb")
      .agg(
        sum(coalesce(col("ina"), lit(0L)) * coalesce(col("inb"), lit(0L))).as("matched"),
        count(lit(1)).as("kk"))
      .select(col("ta"), col("tb"), col("matched"),
        expr("CAST(matched * 1000000 DIV kk AS BIGINT)").as("jaccard_est_ppm"))
    // exact audit: per-user type pairs → intersection sizes; unions by
    // inclusion–exclusion from per-type distinct counts (broadcast)
    val perType = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val inter = ut.as("x").join(ut.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("n_inter"))
    est
      .join(inter, Seq("ta", "tb"), "left")
      .join(broadcast(perType.withColumnRenamed("event_type", "ta")
        .withColumnRenamed("n", "na")), Seq("ta"))
      .join(broadcast(perType.withColumnRenamed("event_type", "tb")
        .withColumnRenamed("n", "nb")), Seq("tb"))
      .select(col("ta"), col("tb"),
        col("matched"), col("jaccard_est_ppm"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        expr("CAST(coalesce(n_inter, 0) * 1000000 DIV (na + nb - coalesce(n_inter, 0)) AS BIGINT)")
          .as("jaccard_exact_ppm"))
  }

  /** q134: COUNT-MIN sketch point queries with their exact audit — the
    * frequency-estimation completion of the sketch family (HLL distinct /
    * KLL quantiles / Misra–Gries heavy hitters / KMV overlap / Bloom
    * membership → CMS counts). Depth d = 4 rows × width w = 4096 cells;
    * row r's position for a user is three md5 hex digits of "r:user", so
    * both engines derive identical cells and the sketch is DETERMINISTIC
    * — exact-oracle-checkable like q129, unlike the RNG-seeded library
    * sketches (q19/q59, rows-only).
    *
    * Build: one scan fans each event to its d cells (×4 on the fact fold,
    * map-side combined) → a 16k-cell table. Query: the exact top-10
    * users (the audit side, computed anyway) probe their d cells against
    * the broadcast sketch; estimate = min over rows; CMS guarantees
    * est ≥ true always (spec-asserted) and bounds the overshoot by the
    * collision mass e·N/w with high probability. The OVERSHOOT column is
    * the sketch's own diagnostic: on a near-uniform feed (this one) no key
    * is ≫ N/w, so the estimate is collision-dominated and the overshoot
    * says "use Misra–Gries (q68) for this distribution" — CMS earns its
    * keep when heavy keys tower over the εN noise floor, and then the
    * same 16k cells serve any key without storing keys at all.
    *
    * 100 TB: the sketch is the mergeable KB-sized artifact (cells add
    * across shards/days — the q59 algebra with exact replay); the exact
    * side here is the audit, not the product.
    */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    def pos(r: Int): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(s"$r:"), col("user_id").cast("string"))), 1, 3), 16, 10)
        .cast("long")
    // build: (row, cell) counts — 4× fan-out, partial-aggregated
    val cells = ev
      .select(posexplode(array((0 until 4).map(pos): _*)).as(Seq("r", "cell")))
      .groupBy("r", "cell").agg(count(lit(1)).as("c"))
    // audit: exact per-user counts, deterministic top-10
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("user_id")).limit(10)
    // probe: each top user's d cells against the broadcast sketch
    val probes = exact.select(col("user_id"), col("true_count"),
      posexplode(array((0 until 4).map(pos): _*)).as(Seq("r", "cell")))
    probes
      .join(broadcast(cells), Seq("r", "cell"))
      .groupBy("user_id", "true_count")
      .agg(min("c").as("cms_est"))
      .select(col("user_id"), col("true_count"), col("cms_est"),
        (col("cms_est") - col("true_count")).as("overshoot"))
  }
}
