package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of two 16-bit dimension keys — the space-
  * filling clustering key with strictly better locality than Z-order
  * (every unit step along the curve moves exactly one cell in one
  * dimension; Morton order takes long diagonal jumps at power-of-two
  * boundaries, which is why Delta Lake moved its OPTIMIZE default
  * from ZORDER to Hilbert). Same contract as [[ZOrderKey]]: low 16
  * bits of each input participate, result ∈ [0, 2³²).
  *
  * Classic Wikipedia xy2d: per level s (high bit first), accumulate
  * s²·((3·rx) XOR ry) and rotate/flip the frame (flip against the
  * full-grid n−1, then swap). The loop is branch-light integer work,
  * codegen'd so a full-table layout write pays no interpreted
  * virtual call per row. Locality + bijectivity pinned in R7OpsSpec
  * via the d2xy inverse.
  */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.HilbertKey.xy2d($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertKey {
  /** SQL-registry constructor (the ZOrderKey.withCasts posture). */
  def withCasts(a: Expression, b: Expression): Expression =
    HilbertKey(
      if (a.dataType == LongType) a else Cast(a, LongType),
      if (b.dataType == LongType) b else Cast(b, LongType))

  /** Reference implementation (also the interpreted path). */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xffffL
    var y = yIn & 0xffffL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = 0xffffL - x
          y = 0xffffL - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (tests): recover (x, y) from the curve position. */
  def d2xy(dIn: Long): (Long, Long) = {
    var t = dIn
    var x = 0L; var y = 0L
    var s = 1L
    while (s < (1L << 16)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
