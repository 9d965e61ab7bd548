package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Lempel-Ziv 1976 phrase-counting complexity of a long-symbol
  * sequence — the classic exhaustive-history parse (Kaspar-Schuster
  * algorithm), O(n²) worst case (r10 ADVICE: the old re-scanning
  * parse was O(n³) on e.g. a constant sequence; matches are now
  * extended INCREMENTALLY by carrying the live candidate start
  * positions as the phrase grows). Runs over the BOUNDED series the
  * house feeds it (day grids, not corpora). Exposed as
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

  /** Phrase counter (reference LZ76 definition): the sequence is
    * parsed left to right; each new phrase is the shortest prefix of
    * the remainder not seen as a substring of the history-so-far
    * extended by the phrase minus its last symbol.
    *
    * Incremental form: a candidate occurrence of s[pos, pos+len) must
    * start at i with i + len ≤ pos + len − 1, i.e. i < pos for EVERY
    * len — so the candidate start set is fixed up front and only ever
    * SHRINKS as the phrase grows (survivor i needs s(i+len) ==
    * s(pos+len)). Per phrase the work is phrase_len × |candidates| ≤
    * phrase_len × n, and Σ phrase_len = n, hence O(n²) worst case.
    */
  private def countPhrases(s: Array[Long]): Int = {
    val n = s.length
    var phrases = 0
    var pos = 0
    val cand = new Array[Int](n)
    while (pos < n) {
      // len = 1 candidates: i < pos with s(i) == s(pos)
      var nc = 0
      var i = 0
      while (i < pos) {
        if (s(i) == s(pos)) { cand(nc) = i; nc += 1 }
        i += 1
      }
      var len = 1
      // grow while s[pos, pos+len) occurs in the history and the end
      // of input isn't reached; a failed extension still belongs to
      // the phrase (it's the novel symbol that terminates it)
      var grown = nc > 0
      while (grown && pos + len < n) {
        var k = 0
        var m = 0
        while (k < nc) {
          if (s(cand(k) + len) == s(pos + len)) { cand(m) = cand(k); m += 1 }
          k += 1
        }
        nc = m
        len += 1
        grown = m > 0
      }
      phrases += 1
      pos += len
    }
    phrases
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
