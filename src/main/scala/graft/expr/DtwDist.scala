package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Dynamic-time-warping distance over two long series with a
  * Sakoe-Chiba band of 10 — classic O(n·m) DP restricted to the band,
  * two-row rolling buffer, EXACT integer |diff| cost (the series
  * arrive as house-convention milli longs, so the distance is itself
  * an exact long). Exposed as `dtw_dist(array<bigint>, array<bigint>)`
  * and codegen'd via a static helper call (the LcsCore posture), so
  * it fuses into whole-stage codegen.
  */
object DtwCore {
  private val INF = Long.MaxValue / 4
  private val BAND = 10

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    val prev = Array.fill[Long](m + 1)(INF)
    val cur = Array.fill[Long](m + 1)(INF)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, INF)
      val ai = a.getLong(i - 1)
      val lo = math.max(1, i - BAND)
      val hi = math.min(m, i + BAND)
      var j = lo
      while (j <= hi) {
        val cost = math.abs(ai - b.getLong(j - 1))
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = if (best >= INF) INF else cost + best
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    if (prev(m) >= INF) -1L else prev(m)
  }
}

case class DtwDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    DtwCore.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.DtwCore.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
