package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

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
