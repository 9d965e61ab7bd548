package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Longest-common-subsequence length over two token arrays — the core
  * of ROUGE-L (Lin 2004). Classic O(n·m) DP with a two-row rolling
  * buffer, so memory is O(min-side) regardless of document length;
  * token compares are UTF8String byte equality (no decode). Exposed
  * as `lcs_len(array<string>, array<string>)` and codegen'd via a
  * static helper call (the JaroCore posture), so it fuses into
  * whole-stage codegen instead of falling back to interpreted eval.
  */
object LcsCore {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val bj = b.getUTF8String(j - 1)
        cur(j) =
          if (ai != null && bj != null && ai.equals(bj)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }
}

case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsCore.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.LcsCore.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
