package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Dynamic-time-warping distance over two long series with a
  * Sakoe-Chiba band of w = max(10, |n−m|) — the standard band
  * widening that keeps the end cell reachable for length-mismatched
  * series (a fixed w=10 would leave (n,m) outside the corridor when
  * |n−m| > 10 and the DP could only return a sentinel). Classic
  * O(n·w) DP restricted to the band, two-row rolling buffer, EXACT
  * integer |diff| cost (the series arrive as house-convention milli
  * longs, so the distance is itself an exact long). Empty input is
  * the one undefined case and returns the −1 sentinel (callers map
  * it to null before deriving per-step ratios). Exposed as
  * `dtw_dist(array<bigint>, array<bigint>)` and codegen'd via a
  * static helper call (the LcsCore posture), so it fuses into
  * whole-stage codegen.
  */
object DtwCore {
  private val INF = Long.MaxValue / 4
  private val BAND = 10

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return -1L
    val w = math.max(BAND, math.abs(n - m))
    val prev = Array.fill[Long](m + 1)(INF)
    val cur = Array.fill[Long](m + 1)(INF)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, INF)
      val ai = a.getLong(i - 1)
      val lo = math.max(1, i - w)
      val hi = math.min(m, i + w)
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
