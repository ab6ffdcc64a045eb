package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class NonEquiShadowSpec extends SparkSpec {

  private def ts(minutes: Int): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  private def tmp(prefix: String): String = {
    val root = new java.io.File("target/streaming-tmp").toPath.toAbsolutePath
    Files.createDirectories(root)
    Files.createTempDirectory(root, prefix).toString
  }

  private def runView(sql: String, name: String, batches: Seq[Map[String, Seq[Change]]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val feedNames = batches.flatMap(_.keys).distinct
    val inputs    = feedNames.map(n => n -> MemoryStream[Change]).toMap
    val planned   = IncrementalPlanner.materialize(
      spark, sql, inputs.map { case (n, s) => n -> s.toDS() })
    val q = planned.df.writeStream.format("memory").queryName(name)
      .outputMode(planned.outputMode)
      .option("checkpointLocation", tmp(name)).start()
    try {
      batches.foreach { batch =>
        batch.foreach { case (feed, cs) => if (cs.nonEmpty) inputs(feed).addData(cs: _*) }
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  private def rowState(table: String, cols: Seq[String]): Map[Long, Seq[Any]] =
    spark.table(table).collect().toSeq
      .sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("seq")))
      .foldLeft(Map.empty[Long, Seq[Any]]) { (m, r) =>
        if (r.getAs[String]("op") == "delete") m - r.getAs[Long]("key")
        else m + (r.getAs[Long]("key") -> cols.map(c => r.getAs[Any](c)))
      }

  test("non-equi correlated subquery over the SAME table: colliding column names") {
    // count of rows in the same group with smaller amount — the textbook
    // non-equi correlation, self-table so every column name collides
    val sql = "SELECT name, " +
      "(SELECT count(*) FROM u t2 WHERE t2.grp = o.grp AND t2.amount < o.amount) AS smaller FROM t o"
    val rows = Seq(
      Change("insert", 1L, ts(0), Map("name" -> "a", "grp" -> "g1", "amount" -> "10"), 1L),
      Change("insert", 2L, ts(1), Map("name" -> "b", "grp" -> "g1", "amount" -> "20"), 2L),
      Change("insert", 3L, ts(2), Map("name" -> "c", "grp" -> "g1", "amount" -> "30"), 3L))
    runView(sql, "pv_shadow", Seq(Map("t" -> rows, "u" -> rows)))
    val got = rowState("pv_shadow", Seq("name", "smaller"))
    assert(got == Map(
      1L -> Seq[Any]("a", "0"),
      2L -> Seq[Any]("b", "1"),
      3L -> Seq[Any]("c", "2")), s"got: $got")
  }
}
