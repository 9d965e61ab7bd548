package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity core, byte-oriented (matches DuckDB's
  * byte-level jaro_winkler_similarity on ASCII data — semantics pinned
  * empirically in R4OpsSpec against the classic vectors):
  *
  *  - match window = max(|a|,|b|)/2 − 1 (floor, min 0)
  *  - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, t = half-transpositions/2
  *  - m = 0 (including any empty input) → 0.0
  *  - Winkler boost only when jaro > 0.7: + L·0.1·(1−jaro), common
  *    prefix L capped at 4
  *
  * Allocation is two small boolean flag arrays per call; everything
  * else is primitive byte compares, so the helper call stays cheap
  * inside whole-stage codegen.
  */
object JaroCore {
  def compute(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes(); val lb = b.numBytes()
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window, lb - 1)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.getByte(i) == b.getByte(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.getByte(l) == b.getByte(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` as a native codegen'd expression — the scorer
  * behind fuzzy entity matching where levenshtein's length-difference
  * bound is too blunt (prefix-weighted name similarity).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroCore.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.JaroCore.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
