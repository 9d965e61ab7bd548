package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of fixed-length float vectors as a typed
  * Aggregator — the one-pass path to centroids: the buffer is a single
  * dense double array (constant size), merged associatively, so
  * partial aggregation works map-side like any built-in agg. Versus
  * posexplode+groupBy this never multiplies rows by the dimension.
  */
class VectorSum(dim: Int) extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = new Array[Double](dim)
  override def reduce(b: Array[Double], a: Seq[Float]): Array[Double] = {
    var i = 0
    val n = math.min(dim, a.length)
    while (i < n) { b(i) += a(i); i += 1 }
    b
  }
  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { x(i) += y(i); i += 1 }
    x
  }
  override def finish(r: Array[Double]): Seq[Double] = r.toSeq
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
