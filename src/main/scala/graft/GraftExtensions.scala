package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expr.Registry

/** The deployment-grade injection point for the whole custom Catalyst
  * surface (SURVEY.md §7.4): start any session with
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every custom function (cosine_sim, minhash_sig, simhash64,
  * bigram_hashes, token_hashes, sorted_intersect_count, ngrams,
  * keccak256, eth_checksum_address) plus the FoldSelfCosine optimizer
  * rule is available — no per-session `Registry.ensure` call needed.
  * `Registry.ensure` remains as the runtime hook for driver-owned
  * sessions (the test/bench contract), registering the identical
  * surface; both paths share `Registry.functions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.expr.Registry", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.FoldSelfCosine)
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    ext.injectOptimizerRule(_ => graft.plans.RewriteBandJoin)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
