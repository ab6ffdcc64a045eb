package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** #105 sketch algebra: the defining property is that a rollup computed by
  * UNIONING stored per-day sketches gives the same answer (within sketch
  * error) as sketching the raw corpus directly — that equivalence is what
  * lets a 100 TB rollup read KB-sized sketch rows instead of raw data.
  */
class SketchesSpec extends SparkSpec {

  test("#105 union-of-daily HLL equals direct sketch within error; both near exact distinct") {
    val rollup = Sketches.rollupFromSketches(Sketches.dailySketches(spark, sf))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val direct = Sketches.directSketches(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("users"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("users")).toMap
    assert(rollup.keySet == direct.keySet && rollup.keySet == exact.keySet)
    // default HLL lgK=12 -> ~1.6% relative standard error; 5% ~= 3 sigma
    exact.foreach { case (et, ex) =>
      val ru = rollup(et).getAs[Long]("approx_users").toDouble
      val di = direct(et).getAs[Long]("approx_users").toDouble
      assert(math.abs(ru - di) / ex <= 0.05, s"$et: union $ru vs direct $di drifted")
      assert(math.abs(ru - ex) / ex <= 0.05, s"$et: union $ru vs exact $ex")
      assert(math.abs(di - ex) / ex <= 0.05, s"$et: direct $di vs exact $ex")
    }
  }

  test("#105 union-of-daily KLL quantiles land at the right exact RANK") {
    val rollup = Sketches.rollupFromSketches(Sketches.dailySketches(spark, sf))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val direct = Sketches.directSketches(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    // exact rank of a sketch-reported quantile value, per event_type
    val valuesByType = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def rankOf(et: String, v: Double): Double = {
      val vs = valuesByType(et); vs.count(_ <= v).toDouble / vs.length
    }
    // default KLL k=200 -> ~1.65% rank error (1 sigma); 5% ~= 3 sigma
    valuesByType.keys.foreach { et =>
      Seq(("p50_sketch", 0.5), ("p90_sketch", 0.9)).foreach { case (colName, q) =>
        val ru = rankOf(et, rollup(et).getAs[Double](colName))
        val di = rankOf(et, direct(et).getAs[Double](colName))
        assert(math.abs(ru - q) <= 0.05, s"$et $colName: union rank $ru far from $q")
        assert(math.abs(di - q) <= 0.05, s"$et $colName: direct rank $di far from $q")
      }
    }
  }
}
