package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Gauss error function via the Abramowitz–Stegun 7.1.26 rational
  * approximation (|ε| ≤ 1.5e-7) — the missing primitive between a
  * z/χ statistic and a p-value (neither Spark nor DuckDB ships erf).
  * The evaluation is a fixed Horner chain, so a DuckDB oracle that
  * spells the SAME chain reproduces the SAME IEEE doubles op-for-op;
  * only exp() may differ by an ulp (both engines' libm), which the
  * consuming keys absorb by rounding outputs — the same posture as
  * every ln/sqrt use in this repo. Codegen'd via a static helper
  * (the LcsCore posture) so it fuses into whole-stage codegen.
  */
object ErfCore {
  // A&S 7.1.26 coefficients
  final val P = 0.3275911
  final val A1 = 0.254829592
  final val A2 = -0.284496736
  final val A3 = 1.421413741
  final val A4 = -1.453152027
  final val A5 = 1.061405429

  def erf(x: Double): Double = {
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + P * ax)
    val poly = ((((A5 * t + A4) * t + A3) * t + A2) * t + A1) * t
    val e = 1.0 - poly * math.exp(-ax * ax)
    if (x < 0) -e else e
  }
}

case class Erf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any): Any =
    ErfCore.erf(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.expr.ErfCore.erf($x)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
