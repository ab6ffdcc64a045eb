package graft.sources

import org.apache.spark.sql.SparkSession

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
}
