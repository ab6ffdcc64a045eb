package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register every snapshot table as a temp view so the whole
  * engine is reachable from `spark.sql(...)` — the way a user of the
  * reference DB would query it. Graft's native functions (`graft_dot`)
  * are registered by [[graft.GraftSession]], so they work in this SQL
  * surface too.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(n))

  /** STREAMING SQL surface (SURVEY.md §2.3 #109): register a live
    * changefeed — or any streaming DataFrame, e.g. a
    * [[graft.streaming.CdcMaterializer]] view — as a temp view, making it
    * queryable with plain `spark.sql(...)` the way a changefeed-DB user
    * expects. The SQL text compiles onto the STREAMING logical plan: the
    * result is itself a streaming DataFrame (Catalyst plans SQL-over-
    * stream and DataFrame-over-stream identically), started with
    * `writeStream` like any other; watermarks and stateful semantics
    * carry through unchanged.
    */
  def registerStream(stream: DataFrame, name: String): Unit =
    stream.createOrReplaceTempView(name)
}
