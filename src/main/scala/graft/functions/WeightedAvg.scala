package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class WAvgBuf(num: Double, den: Double)

/** Typed custom aggregate (Dataset `Aggregator`): weight-weighted mean.
  * Registered as SQL function `graft_wavg(x, w)` — the (b) tier of the
  * custom-operator ladder: a TypedColumn/UDAF where built-in aggregates
  * can't express the semantics as one function. Partial-aggregates and
  * merges like any native aggregate (num/den fold), so it map-side
  * combines and shuffles O(groups).
  */
class WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
  override def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf =
    WAvgBuf(b.num + a._1 * a._2, b.den + a._2)
  override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf = WAvgBuf(x.num + y.num, x.den + y.den)
  override def finish(b: WAvgBuf): Double = if (b.den == 0.0) Double.NaN else b.num / b.den
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
