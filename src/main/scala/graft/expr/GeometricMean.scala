package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed Aggregator: exp(avg(ln(x))).
  *
  * Log-space accumulation keeps the partial (map-side) aggregation
  * associative and overflow-free at any scale — the buffer is a
  * constant-size (sum, count) pair, so partial+final aggregation works
  * exactly like a built-in agg at 100 TB. Non-positive inputs are
  * ignored (log undefined), mirroring `EXP(AVG(LN(x)))` over x > 0.
  */
object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    if (a > 0.0) (b._1 + math.log(a), b._2 + 1L) else b
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
