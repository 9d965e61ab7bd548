package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two 16-bit dimension keys into one
  * 32-bit-wide long — the multi-dimensional clustering key for data
  * layout (SURVEY.md §2 B.1 `q_zorder_layout`, §7.5).
  *
  * Sorting (or `repartitionByRange`-ing) a table by this key before a
  * partitioned write co-locates rows that are close in BOTH dimensions
  * into the same files, so the parquet min/max footer stats stay tight
  * on either column and a predicate on either dimension prunes most
  * files before decoding a row. That is the 100 TB story: a linear
  * clustering key buys two-dimensional scan pruning — the technique
  * behind Delta/Iceberg `ZORDER BY`, expressed here as a native
  * codegen'd expression (a row-at-a-time bit interleave must not cost
  * an interpreted virtual call per row on a full-table write).
  *
  * Only the low 16 bits of each input participate (callers mod/mask
  * their dimension into [0, 65536) — higher bits would make the
  * interleave silently non-local, so they are masked off rather than
  * trusted). Bit i of `left` lands at position 2i, bit i of `right`
  * at 2i+1; the result is always in [0, 2^32), nonnegative.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrderKey {
  /** SQL-registry constructor: widen int dimension keys to long so
    * `zorder2(int_col, int_col)` works without an explicit CAST. */
  def withCasts(a: Expression, b: Expression): Expression =
    ZOrderKey(
      if (a.dataType == LongType) a else Cast(a, LongType),
      if (b.dataType == LongType) b else Cast(b, LongType))

  /** Reference implementation (also the interpreted path). */
  def interleave16(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Inverse (tests): recover the two 16-bit dimension keys. */
  def deinterleave16(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < 16) {
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }
}
