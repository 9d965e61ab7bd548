package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Lempel-Ziv 1976 phrase-counting complexity of a long-symbol
  * sequence — the classic exhaustive-history parse (Kaspar-Schuster
  * algorithm), O(n²) worst case over the BOUNDED series the house
  * feeds it (day grids, not corpora). Exposed as
  * `lz76(array<bigint>)` and codegen'd via a static helper call (the
  * LcsCore posture).
  */
object Lz76Core {
  def compute(a: ArrayData): Int = {
    val n = a.numElements()
    if (n == 0) return 0
    val s = new Array[Long](n)
    var t = 0
    while (t < n) { s(t) = a.getLong(t); t += 1 }
    countPhrases(s)
  }

  /** Straightforward phrase counter (reference LZ76 definition): the
    * sequence is parsed left to right; each new phrase is the
    * shortest prefix of the remainder not seen as a substring of the
    * history-so-far extended by the phrase minus its last symbol.
    */
  private def countPhrases(s: Array[Long]): Int = {
    val n = s.length
    var phrases = 0
    var pos = 0
    while (pos < n) {
      var len = 1
      // grow len while s[pos, pos+len) occurs in s[0, pos+len-1)
      var grown = true
      while (grown && pos + len <= n) {
        grown = occursIn(s, pos, len, pos + len - 1)
        if (grown) {
          if (pos + len == n) { grown = false }
          else len += 1
        }
      }
      phrases += 1
      pos += len
    }
    phrases
  }

  private def occursIn(s: Array[Long], start: Int, len: Int,
      histEnd: Int): Boolean = {
    var i = 0
    while (i + len <= histEnd) {
      var j = 0
      var ok = true
      while (ok && j < len) {
        if (s(i + j) != s(start + j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }
}

case class Lz76(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any): Any =
    Lz76Core.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.Lz76Core.compute($a)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
