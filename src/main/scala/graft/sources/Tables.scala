package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-table loaders.
  *
  * Every operator reads through these so schema quirks are handled in one
  * place and scans stay pushdown-friendly (plain parquet scans; filters and
  * projections placed by the callers land in `PushedFilters`/`ReadSchema`).
  */
object Tables {
  private def path(dir: String, name: String) = s"$dir/$name.parquet"

  /** Generic loader (events routed through the ns-timestamp fix-up). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(path(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(path(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame     = spark.read.parquet(path(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(path(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "lineitem"))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "embeddings"))

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * refuses to read natively (PARQUET_TYPE_ILLEGAL). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * [[graft.GraftSession.tuning]]) it arrives as a long of epoch nanos; we
    * floor-truncate to microsecond timestamps. Truncating ns -> us can never
    * flip a comparison against a us-aligned (or coarser) timestamp, so all
    * joins/filters against the ms-granularity TPC-H dates stay exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
