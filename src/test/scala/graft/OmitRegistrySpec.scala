package graft

import org.scalatest.funsuite.AnyFunSuite

/** r10 VERDICT task 9: the single place the oracle-OMIT set is
  * allowed to exist. Every `queries` key WITHOUT an `oracleSql` entry
  * (the driver then records only a weaker rows-only check) must be
  * enumerated here with the spec that pins its semantics in pure
  * Scala — so the OMIT set cannot silently grow: adding an
  * un-oracled key without a named pin fails this suite.
  */
class OmitRegistrySpec extends AnyFunSuite {

  /** key → the ScalaTest class that carries its equality/property
    * pin (each pin recomputes the semantics independently — a fold,
    * a NIST vector, a recall bound — see the named suite).
    */
  private val registry: Map[String, String] = Map(
    "q_agg_approx_distinct" -> "graft.StreamingSpec",      // 5%-of-exact bound
    "q_bpe_apply"           -> "graft.R6OpsSpec",          // canonical-prefix fold
    "q_bpe_learn"           -> "graft.R6OpsSpec",          // exact batched BPE fold
    "q_compress_ratio"      -> "graft.ExprSpec",           // deflate_len roundtrip + invariants
    "q_dedup_lsh_resolve"   -> "graft.R5OpsSpec",          // candidate-superset + CC equality
    "q_dsv2_burn_backfill"  -> "graft.R6OpsSpec",          // DSv2 batch-read equality
    "q_dtw_pairs"           -> "graft.R10sOpsSpec",        // banded DP fold
    "q_embed_pca"           -> "graft.R6OpsSpec",          // Gram-eigen invariants
    "q_eth_eip55"           -> "graft.R9pOpsSpec",         // Keccak NIST vectors (KeccakSpec)
    "q_hll_sketch"          -> "graft.R5OpsSpec",          // HLL error envelope
    "q_kll_quantile"        -> "graft.R6OpsSpec",          // KLL rank-error bound
    "q_lz76_series"         -> "graft.R10yOpsSpec",        // reference-parse fold
    "q_minhash_error"       -> "graft.R10eOpsSpec",        // MinHash concentration bound
    "q_minhash_lsh"         -> "graft.ExprSpec",           // ≥0.9-recall pin
    "q_rouge_l"             -> "graft.R7OpsSpec",          // LCS fold
    "q_simhash"             -> "graft.R6OpsSpec",          // brute-hamming completeness
    "q_simhash_dedup"       -> "graft.R6OpsSpec",          // banding completeness
    "s_dsv2_burn_ingest"    -> "graft.BurnSourceSpec",     // offsets/admission/resume
    "s_late_data"           -> "graft.StreamingSpec",      // watermark-drop equality
    "s_stateful_sessionize" -> "graft.StreamingSpec",      // session-gap fold
    "s_stream_lsh_dedup"    -> "graft.StreamingSpec",      // stream-static bucket equality
    "s_stream_stream_join"  -> "graft.StreamingSpec",      // interval-join fold
    "s_tws_running_total"   -> "graft.R5OpsSpec",          // transformWithState equality
    "s_tws_session_timeout" -> "graft.StreamingSpec"       // timeout-path fold
  )

  test("the OMIT set is exactly the registered keys") {
    val omitted = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(omitted == registry.keySet,
      s"unregistered OMITs: ${(omitted -- registry.keySet).toSeq.sorted}; " +
      s"stale registry rows: ${(registry.keySet -- omitted).toSeq.sorted}")
  }

  test("every registered pin suite exists on the classpath") {
    registry.values.toSet.foreach { (cls: String) =>
      Class.forName(cls) // throws if the pin suite was deleted/renamed
    }
  }

  test("every registered key is still a real queries entry") {
    registry.keySet.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"$k vanished from queries")
    }
  }
}
