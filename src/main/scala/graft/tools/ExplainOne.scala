package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8).config("spark.ui.enabled", "false")
    GraftSession.staticTuning.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
