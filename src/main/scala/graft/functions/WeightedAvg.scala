package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2-J9: typed UDAF surface — an `Aggregator` computing a weighted sum /
  * weight-total pair in exact integer arithmetic (cents). The buffer is
  * associative + commutative, so Spark runs it as partial (map-side) +
  * final aggregation — the shape that scales.
  */
case class WPoint(seg: String, w: Long, cents: Long)
case class WSum(wsum: Long, wtot: Long)

object WeightedSumAgg extends Aggregator[WPoint, WSum, WSum] {
  def zero: WSum = WSum(0L, 0L)
  def reduce(b: WSum, p: WPoint): WSum = WSum(b.wsum + p.w * p.cents, b.wtot + p.w)
  def merge(a: WSum, b: WSum): WSum = WSum(a.wsum + b.wsum, a.wtot + b.wtot)
  def finish(r: WSum): WSum = r
  def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
  def outputEncoder: Encoder[WSum] = Encoders.product[WSum]
}
