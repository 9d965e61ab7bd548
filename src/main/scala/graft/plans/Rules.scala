package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Alias, And, AttributeReference, Cast, CreateArray, Divide, EqualTo, Explode, Expression, Floor, GreaterThanOrEqual, Greatest, Least, LessThanOrEqual, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

import graft.expr.{CosineSimilarity, SelfCosine}

/** Custom optimizer rules (SURVEY.md §4.2 — the `Rule[LogicalPlan]`
  * surface, injected via `spark.experimental.extraOptimizations`).
  *
  * `FoldSelfCosine`: cosine_sim(x, x) is 1.0 for any non-degenerate x —
  * rewrite it at plan time to the O(1)-typical SelfCosine so a
  * self-similarity guard (a common pattern in similarity-join
  * predicates, e.g. `cosine_sim(a, b) >= t OR a_id = b_id`) costs
  * almost nothing per row. NOT folded to a bare literal: that would
  * turn NULL inputs into 1.0 and lose the NaN of zero-norm vectors —
  * SelfCosine preserves both (pinned in RuleSpec).
  *
  * The larger rewrite documented in SURVEY.md §7.3 — turning a
  * `cosine_sim(a, b) >= τ` cross join into an LSH-bucketed equi-join —
  * is intentionally expressed as explicit operators instead
  * (q_minhash_lsh / q_sim_ivf): at 100 TB you want the candidate
  * structure visible in the query, not hidden in an optimizer that
  * silently changes recall. This rule demonstrates the mechanism.
  */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        SelfCosine(a)
    }
}

/** Automatic band-join rewrite (the range-join optimization a
  * warehouse engine ships; contrast the similarity rewrite SURVEY
  * §7.3 deliberately does NOT hide): an INNER join whose condition
  * contains `abs(a.x − b.y) <= w` (w a positive numeric literal, x/y
  * numeric, one per side) is a theta join — Spark plans it as a
  * BroadcastNestedLoopJoin (O(n·m) comparisons) or a cartesian.
  * But the band admits an EXACT bucketization: with buckets of width
  * w, a match's endpoints land within one bucket of each other, so
  *
  *  - the left side gains `floor(x / w)` as a join key;
  *  - the right side explodes `floor(y / w) + {-2..2}` (±1 suffices
  *    in real arithmetic; ±2 absorbs floating-point division
  *    rounding at bucket boundaries — candidate overcounting is
  *    harmless, the residual filter decides membership);
  *  - the ORIGINAL condition stays as the residual filter, so the
  *    rewrite cannot change semantics — only the candidate set an
  *    executor enumerates.
  *
  * The join becomes an equi-join on the bucket key: shuffle/broadcast
  * HASH join, O(matches + corpus) work — at 100 TB the difference
  * between a day and a minute. Unlike LSH/IVF rewrites there is no
  * recall tradeoff (the rewrite is exact), which is why THIS one is
  * safe to hide in the optimizer. Guard: the injected bucket columns
  * are named `graft_band_bucket_*`; their presence on a join child
  * marks an already-rewritten join (the extraOptimizations batch runs
  * to fixpoint).
  */
object RewriteBandJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def posLit(e: Expression): Option[Double] = e match {
    case Literal(v: Number, _: NumericType) if v.doubleValue() > 0 =>
      Some(v.doubleValue())
    case _ => None
  }

  /** The analyzer wraps integral operands in numeric widening casts
    * (`cast(abs(a − b) AS double) <= 1000.0`), which hid the band
    * shape from the matcher for exactly the long/decimal columns the
    * clamp exists for — see through them. Membership is unaffected:
    * the ORIGINAL (cast-bearing) condition always rides as the
    * residual filter. */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _: NumericType, _, _) => stripCast(c)
    case _ => e
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !left.output.exists(_.name.startsWith("graft_band_bucket")) &&
           !right.output.exists(_.name.startsWith("graft_band_bucket")) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def okTypes(x: Expression, y: Expression): Boolean =
        x.dataType.isInstanceOf[NumericType] &&
          y.dataType.isInstanceOf[NumericType] &&
          x.deterministic && y.deterministic
      // form 1: abs(x − y) <= w  (modulo widening casts)
      val absForm = conjuncts.collectFirst(Function.unlift {
        case LessThanOrEqual(lhs, wl) if posLit(wl).isDefined =>
          stripCast(lhs) match {
            case Abs(Subtract(x0, y0, _), _) =>
              val (x, y) = (stripCast(x0), stripCast(y0))
              if (okTypes(x, y)) Some((x, y, posLit(wl).get)) else None
            case _ => None
          }
        case _ => None
      })
      // form 2: the BETWEEN spelling — x >= y − w AND x <= y + w
      lazy val pairForm = {
        val ges = conjuncts.collect(Function.unlift {
          case GreaterThanOrEqual(x0, rhs) =>
            stripCast(rhs) match {
              case Subtract(y0, wl, _) if posLit(wl).isDefined =>
                val (x, y) = (stripCast(x0), stripCast(y0))
                if (okTypes(x, y)) Some((x, y, posLit(wl).get)) else None
              case _ => None
            }
          case _ => None
        })
        val les = conjuncts.collect(Function.unlift {
          case LessThanOrEqual(x0, rhs) =>
            stripCast(rhs) match {
              case Add(y0, wl, _) if posLit(wl).isDefined =>
                val (x, y) = (stripCast(x0), stripCast(y0))
                if (okTypes(x, y)) Some((x, y, posLit(wl).get)) else None
              case _ => None
            }
          case _ => None
        })
        (for {
          g <- ges; l <- les
          if g._1.semanticEquals(l._1) && g._2.semanticEquals(l._2) &&
            g._3 == l._3
        } yield g).headOption
      }
      val bandOpt = absForm.orElse(pairForm)
      bandOpt.flatMap { case (x, y, w) =>
        // orient (x, y) to (left side, right side)
        val oriented =
          if (x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet)) Some((x, y))
          else if (y.references.subsetOf(left.outputSet) &&
                   x.references.subsetOf(right.outputSet)) Some((y, x))
          else None
        oriented.map { case (lx, rx) =>
          val wLit = Literal(w, DoubleType)
          // Saturating bucketization (r6 ADVICE): the quotient x/w is
          // clamped to ±2^50 BEFORE flooring. Inside the clamp range
          // the double error in floor(x/w) is < 2^-2 buckets (quotient
          // relative error 2^-53, plus the cast-of-x error, both
          // ≤ |q|·2^-53 ≤ 2^-3), so the ±2 expansion is provably
          // sufficient; outside it ALL values collapse into the two
          // sentinel buckets ±2^50, where any band-mates meet by
          // equality (a pair straddling the boundary differs by ≤ 1
          // bucket). This keeps the rewrite EXACT for every numeric
          // type and range — microsecond-epoch longs with a small w,
          // wide decimals — instead of silently dropping matches once
          // |x/w| outgrows double precision. The saturated buckets
          // skew only if real data lives beyond 2^50·w, where the
          // residual filter still decides membership.
          val cap = Literal(1.125899906842624e15, DoubleType) // 2^50
          val negCap = Literal(-1.125899906842624e15, DoubleType)
          def clampedBucket(e: Expression): Expression =
            Floor(Least(Seq(Greatest(Seq(
              Divide(Cast(e, DoubleType), wLit), negCap)), cap)))
          val bl = Alias(clampedBucket(lx), "graft_band_bucket_l")()
          val left2 = Project(left.output :+ bl, left)
          val rBucket = clampedBucket(rx)
          val arr = CreateArray((-2 to 2).map(i =>
            Add(rBucket, Literal(i.toLong))))
          val gOut = AttributeReference("graft_band_bucket_r", LongType,
            nullable = true)()
          val right2 = Generate(Explode(arr), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(gOut),
            child = right)
          // equi key first for readability; the extractor scans all
          // conjuncts. The full original condition rides as residual.
          val newCond = (EqualTo(bl.toAttribute, gOut) +: conjuncts)
            .reduce(And)
          Project(j.output, Join(left2, right2, Inner, Some(newCond), hint))
        }
      }.getOrElse(j)
  }
}
