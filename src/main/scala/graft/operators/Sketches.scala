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
}
