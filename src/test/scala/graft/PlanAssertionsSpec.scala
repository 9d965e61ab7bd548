package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §4.3 plan audit, pinned as regression tests: these are
  * the plan shapes that make the operators scale — losing any of them
  * is a performance bug even while results stay correct.
  */
class PlanAssertionsSpec extends AnyFunSuite with SparkFixture {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString()

  test("q_scan_pruned pushes the filter and prunes columns at the scan") {
    val p = plan("q_scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_shipdate"), p)
  }

  test("q_agg_q1 pushes the date filter and reads only needed columns") {
    val p = plan("q_agg_q1")
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "q1 must not read unused key columns\n" + p)
  }

  test("q_join_5way broadcasts the dimension tables") {
    val p = plan("q_join_5way")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)"), p)
  }

  test("q_topk_global plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q_topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_sim_cosine_topk broadcasts the query vector (no shuffle join)") {
    val p = plan("q_sim_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q_win_ntile_cume is the ONLY deliberately-global q_win* window") {
    // global-quantile semantics on a bounded dimension table — pinned
    // so any future un-partitioned window (a single-task scale-killer
    // on unbounded input) fails this test and must justify itself here.
    // Sanctioned global windows OUTSIDE the q_win* family: q_skyline
    // (runs over the distinct-price aggregate, bounded) and
    // q_zorder_layout (ntile file-number stand-in; the production
    // write path is repartitionByRange, not this window) — both
    // document their bound at the query site.
    val p = plan("q_win_ntile_cume")
    assert(p.contains("Window"), p)
    val offenders = SparkEntry.queries.keys.filter(_.startsWith("q_win")).filter { k =>
      val s = plan(k)
      // an un-partitioned window plans a SinglePartition exchange
      s.contains("Window") && s.contains("SinglePartition")
    }
    assert(offenders.toSet === Set("q_win_ntile_cume"), offenders.toString)
  }

  test("q_tpch_q10 pushes the returnflag filter to the scan; no cartesian") {
    val p = plan("q_tpch_q10")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag must reach the parquet scan\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q18 aggregates lineitem (2 columns only) below the joins") {
    val p = plan("q_tpch_q18")
    assert(p.contains("partial_sum"), "map-side partial agg expected\n" + p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      "lineitem scan must read exactly the agg columns\n" + p)
  }

  test("q_skyline joins back via equi-join, never the quadratic self-join") {
    val p = plan("q_skyline")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  /** Run `f` with AQE disabled, restoring the PRIOR value afterwards
    * (r5, ADVICE: a hardcoded restore-to-"true" leaked a config change
    * into later tests whenever the fixture ran with AQE off). */
  private def withAqeDisabled[A](f: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("q_zorder_layout computes the Morton key inside codegen") {
    val code = withAqeDisabled {
      SparkEntry.queries("q_zorder_layout")(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
    }
    assert(code.contains("WholeStageCodegen"), code.take(500))
    assert(!code.toLowerCase.contains("fallback eval"), code.take(1500))
  }

  test("q_join_bucketed: agg and join run with ZERO hash-partition exchanges") {
    // both tables are bucketed+sorted on the join key, so the per-order
    // aggregate and the orders⋈lineitem join must reuse the bucket
    // layout — any "Exchange hashpartitioning" means the write-time
    // shuffle amortization was lost
    val df = SparkEntry.queries("q_join_bucketed")(spark, sf)
    df.collect() // AQE finalizes the executed plan
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Exchange rangepartitioning"),
      "orderBy+limit must plan as TakeOrderedAndProject\n" + p)
  }

  test("q_join_bloom_prefilter probes the bloom BEFORE the semi join") {
    val df = SparkEntry.queries("q_join_bloom_prefilter")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    val probe = p.indexOf("Filter might_contain")
    val join = p.indexOf("LeftSemi")
    assert(probe >= 0, "bloom probe missing from the plan\n" + p)
    assert(join >= 0, "exact semi-join verify missing\n" + p)
    // tree prints top-down: the filter must sit BELOW (after) the join
    assert(probe > join, "bloom filter must prune the probe side below the join\n" + p)
  }

  test("q_io_partitioned prunes to one partition directory at the scan") {
    val p = plan("q_io_partitioned")
    assert(p.contains("PartitionFilters: [isnotnull(o_orderpriority"), p)
    assert(p.contains("(o_orderpriority") && p.contains("= 1-URGENT"), p)
  }

  test("q_kmeans assignment never shuffles the vectors") {
    // the MLlib shape: packed broadcast centroids + per-row argmax.
    // A groupBy(vec_id) argmax would hashpartition the corpus WITH its
    // embedding column — the shape this pin forbids.
    val p = plan("q_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("hashpartitioning(vec_id"),
      "per-vector argmax must be map-side, not a shuffle\n" + p)
  }

  test("q_pagerank iterations read the checkpointed edges, never the set-sim join") {
    val p = plan("q_pagerank")
    assert(p.contains("Scan ExistingRDD"),
      "edges must come from the localCheckpoint\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("sortedintersectcount"),
      "re-running the set-sim verify inside the loop means the checkpoint was lost\n" + p)
  }

  test("q_fuzzy_match candidates come from the band equi-join, not a cartesian") {
    val p = plan("q_fuzzy_match")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  // r5: the q_dedup_* keys now serve from EdgeGraph's memoized
  // checkpoint (their executedPlan is a Scan ExistingRDD), so the
  // derivation-shape pins below run SetSimJoin.auto directly on the
  // same inputs EdgeGraph feeds it — identical plan, pinned at the
  // operator instead of the (now cache-fronted) query key.
  private def setSimPlan(hashFn: String, tau: Double): String = {
    graft.expr.Registry.ensure(spark)
    graft.operators.SetSimJoin.auto(spark,
      graft.tables.Tables.documents(spark, sf)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang"),
          org.apache.spark.sql.functions.expr(s"$hashFn(split(text, ' '))").as("hs")),
      tau).queryExecution.executedPlan.toString()
  }

  test("dedup plans keep their r2 shapes (the r1 local[32] blowup guards)") {
    // near-jaccard: no single-partition exchange anywhere (the r1
    // global token-rank window funneled the vocabulary through one
    // task), and verification is the codegen'd sorted merge
    val nj = setSimPlan("token_hashes", 0.8)
    assert(!nj.contains("SinglePartition"), nj)
    assert(nj.toLowerCase.contains("sortedintersectcount"), nj)
    // shingle: count strategy — no window, no cartesian, no
    // verification join on arrays
    val sh = setSimPlan("bigram_hashes", 0.3)
    assert(!sh.contains("Window") && !sh.contains("CartesianProduct"), sh)
    assert(sh.toLowerCase.contains("bigramhashes") || sh.toLowerCase.contains("bigram_hashes"), sh)
  }

  test("auto-intersect dedup probes via broadcast with a redistributed probe side") {
    // SetSimJoin.auto lands on the broadcast-intersect strategy for
    // this corpus: the probe must be a broadcast join (no shuffle of
    // the pair space, no cartesian) and the probe side must carry an
    // explicit redistribution — without it a single-split input runs
    // the entire |block|^2 probe in ONE task (pinned after measuring
    // exactly that: 12 s single-task vs 1.6 s redistributed).
    val p = setSimPlan("token_hashes", 0.8)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("RoundRobinPartitioning"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dedup_* keys scan the memoized edge checkpoint, not a re-derivation") {
    // five graph keys share three (kind, τ) edge tables; each key's
    // own plan must be a checkpoint scan (the derivation cost is paid
    // once per session — VERDICT r4 item 1)
    val p = plan("q_dedup_near_jaccard")
    assert(p.contains("Scan ExistingRDD"), p)
    val p2 = plan("q_dedup_shingle")
    assert(p2.contains("Scan ExistingRDD"), p2)
  }

  test("q_scd2_dim: both windows share ONE hash-partition exchange") {
    // lag (change detection) and lead (interval close) run over the
    // same (user_id) partitioning — a second exchange would mean the
    // window specs diverged and the build costs two shuffles at scale
    val p = plan("q_scd2_dim")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges\n$p")
  }

  test("q_join_interval_overlap joins on hour buckets — no cartesian/BNLJ") {
    // the interval×interval overlap must come from the bucket
    // equi-join; a CartesianProduct or BroadcastNestedLoopJoin means
    // the quadratic theta join is back and the key dies at scale
    val p = plan("q_join_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("bkt"), p)
  }

  test("q_snapshot_diff diffs via one full-outer hash join") {
    val p = plan("q_snapshot_diff")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_salted_distinct keeps the two-level (salted) aggregate shape") {
    // phase 1 must aggregate on (event_type, salt) before the final
    // per-type sum — if the optimizer ever collapsed the salt column
    // away the plan would re-concentrate hot keys on one reducer
    val p = plan("q_salted_distinct")
    assert(p.contains("salt"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 4, p)
  }

  test("q_fuzzy_jw verifies only blocked candidates — no cartesian in the plan") {
    // both blocking legs (first-char equi-join; log2-length band join)
    // must plan as hash/merge joins: a CartesianProduct or
    // BroadcastNestedLoopJoin means the all-pairs cross join is back
    val p = plan("q_fuzzy_jw")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("q_knn_per_label joins on (label, cell) — never a label-only self-join") {
    val df = SparkEntry.queries("q_knn_per_label")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), p)
    // every shuffled join keyed on label must also carry the cell key;
    // label-only joins are allowed ONLY as broadcasts (the 10-row
    // packed-centroid dimension join)
    val shuffledJoin = """(?:SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\]""".r
    shuffledJoin.findAllMatchIn(p).foreach { m =>
      val keys = m.group(1)
      if (keys.contains("label"))
        assert(keys.contains("cell") || keys.contains("cb"),
          s"label-only shuffled self-join found: $keys\n" + p)
    }
    // and the cell key is actually present in some join of the plan
    assert(p.contains("cell") || p.contains("cb#"), p)
  }

  test("q_tfidf_top: AQE still broadcasts the vocab side at test scale without the hint") {
    // the explicit broadcast() hint was removed (vocabulary-sized side
    // cannot be assumed executor-fitting at corpus scale); this pins
    // that the LOCAL plan did not regress to a shuffle join — AQE must
    // still pick a broadcast from runtime stats at test sf
    val df = SparkEntry.queries("q_tfidf_top")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q_join_skew_salted joins shuffled on (suppkey, salt) — not broadcast") {
    // the whole point of the salt is spreading one hot suppkey over 16
    // shuffle partitions; if the join degrades to a broadcast (AQE
    // would pick one at this scale without the SHUFFLE_HASH hint) the
    // rewrite is untested, and if the join keys lose the salt column
    // the hot keys re-concentrate
    val p = plan("q_join_skew_salted")
    assert(p.contains("ShuffledHashJoin"), p.take(1500))
    val keys = """ShuffledHashJoin \[([^\]]*)\]""".r.findFirstMatchIn(p).get.group(1)
    assert(keys.contains("l_suppkey") && keys.contains("salt"), keys)
  }

  test("q_tpch_q7 broadcasts both nation-filtered sides; facts pre-filtered") {
    val p = plan("q_tpch_q7")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(2000))
    // the shipdate restriction must reach the lineitem scan
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(2000))
  }

  test("q_vocab_prune scans the corpus once and rolls up from the count table") {
    // one FileScan of documents (no join back), with partial
    // aggregation below both shuffles
    val p = plan("q_vocab_prune")
    assert("FileScan parquet".r.findAllIn(p).length === 1, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("q_boilerplate_strip joins chunk-frequency back on (source, h) hash keys") {
    val p = plan("q_boilerplate_strip")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val keys = """(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[([^\]]*)\]""".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(keys.contains("source") && keys.contains("h"), keys + "\n" + p.take(1500))
  }

  test("q_tpch_q14 broadcasts part; month filter pushed to the lineitem scan") {
    val p = plan("q_tpch_q14")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(2000))
  }

  test("q_join_lateral decorrelates to a rank-limit join, never a per-row loop") {
    // the correlated LATERAL ... ORDER BY ... LIMIT must become a
    // rank-limited equi-join — vanilla Spark's WindowGroupLimit, or
    // this repo's two-phase TopKPerGroup once RewriteWindowTopK is
    // registered (either is the sub-quadratic shape); a
    // BroadcastNestedLoopJoin/CartesianProduct here means Catalyst
    // re-executes the subquery per outer row — quadratic at scale
    val p = plan("q_join_lateral")
    assert(p.contains("WindowGroupLimit") || p.contains("TopKPerGroup"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_stats_prune joins the fact to the stats side via broadcast") {
    // the surviving-partition list must be the broadcast side of the
    // re-scan join — a shuffled join would defeat the point of pruning
    val p = plan("q_stats_prune")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_compaction_plan windows per source — never a global single partition") {
    val p = plan("q_compaction_plan")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("SinglePartition"), p.take(2000))
  }

  test("whole-stage codegen covers the cosine expression") {
    // AQE materializes codegen per executed stage, so the pre-execution
    // explain reports 0 subtrees — disable AQE just for this probe
    val code = withAqeDisabled {
      SparkEntry.queries("q_sim_cosine_topk")(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
    }
    assert(code.contains("WholeStageCodegen"), code.take(500))
    // and the fused cosine loop is inside the generated code, not a
    // fallback eval
    assert(code.contains("Math.sqrt"), code.take(500))
  }

  test("q_tpch_q6 is scan-bound: all predicates pushed, 4-column read, no join") {
    val p = plan("q_tpch_q6")
    // toString truncates the PushedFilters list — assert on its head
    // plus the post-scan Filter's residual predicates
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)"), p)
    assert(p.contains(">= 0.05)") && p.contains("< 24.0)"), p)
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"), p)
    assert(!p.contains("Join"), "Q6 must not join\n" + p)
    assert(!p.contains("l_orderkey"), "Q6 must not read key columns\n" + p)
  }

  test("q_tpch_q4 plans the EXISTS as a left semi join on orderkey") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q21 keeps semi+anti probes equi-keyed (no cartesian)") {
    val p = plan("q_tpch_q21")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q22 broadcasts the 1-row threshold and anti-joins date-pruned orders") {
    val p = plan("q_tpch_q22")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_scan_agg_pushdown answers MIN/MAX/COUNT from parquet footers (PushedAggregation)") {
    val p = plan("q_scan_agg_pushdown")
    assert(p.contains("PushedAggregation: [COUNT(*)"), p)
    assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_quantity)"), p)
  }

  test("q_scan_groupby_pushdown pushes the partition-column GROUP BY to the scan") {
    val p = plan("q_scan_groupby_pushdown")
    assert(p.contains("PushedAggregation: [COUNT(*)"), p)
    assert(p.contains("PushedGroupBy: [o_orderpriority]"), p)
  }

  test("q_tpch_q2's correlated min is ONE partition-window, part slice pushed to scan") {
    val p = plan("q_tpch_q2")
    // one window, partitioned by ps_partkey (never SinglePartition)
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), "window must partition by part\n" + p)
    assert(p.contains("LessThanOrEqual(p_size,15)"), "part slice must push to scan\n" + p)
  }

  test("q_tpch_q9 broadcasts nation; part color slice pushes to the part scan") {
    val p = plan("q_tpch_q9")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("StringContains(p_name,red)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q11 broadcasts the 1-row threshold over the checkpointed per-part table") {
    val p = plan("q_tpch_q11")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the corpus-sized slice is behind the localCheckpoint — the final
    // plan must NOT rescan lineitem
    assert(!p.contains("lineitem"), "threshold pass must read the checkpoint, not the corpus\n" + p)
  }

  test("q_tpch_q20 keeps both probes semi-keyed; 1997 window pushed to the fact scan") {
    val p = plan("q_tpch_q20")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q_bm25_topk probes the term index once, scoring join broadcast, window partitioned") {
    val p = plan("q_bm25_topk")
    // the idf/avgdl probe side reaches the fact table as a broadcast —
    // a shuffle here would re-partition the corpus-sized term index
    assert(p.contains("BroadcastHashJoin"), p)
    // ranking goes through the two-phase TopKPerGroup (partial top-k
    // before the qid exchange), never a global single-task window
    assert(p.contains("TopKPerGroup [qid"), p)
    // the ONLY single-partition exchange is the 1-row corpus aggregate
    // (count + total doc length) feeding the broadcast probe side
    assert("SinglePartition".r.findAllIn(p).size == 1, p)
  }

  test("ExactQuantiles probes broadcast; ranking window is per-group, not global") {
    val df = graft.operators.ExactQuantiles.byGroup(
      graft.tables.Tables.events(spark, sf), Seq("event_type"), "value", Seq(0.5))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SinglePartition"), "rank window must partition by group\n" + p)
  }

  test("q_ohlc_resample is ONE partial+final aggregate — no window sort") {
    // open/close via min_by/max_by ride the same shuffle as high/low/
    // volume; a Window in this plan means the arg-min/max degenerated
    // to the two-sort row_number formulation
    val p = plan("q_ohlc_resample")
    assert(!p.contains("Window"), "OHLC must not plan a window sort\n" + p)
    assert(p.contains("partial_min_by") || p.contains("min_by"), p)
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      "exactly one shuffle for the bar aggregate\n" + p)
  }

  test("q_attribution_last / q_gini / q_topk_diverse windows stay per-group") {
    for (k <- Seq("q_attribution_last", "q_gini", "q_topk_diverse")) {
      val p = plan(k)
      // with Registry.ensure active in the shared session,
      // RewriteWindowTopK lowers q_topk_diverse's row_number windows
      // to the bounded-heap TopKPerGroup plan — also per-group, better
      assert(p.contains("Window") || p.contains("TopKPerGroup"),
        s"$k lost its per-group rank operator\n" + p)
      assert(!p.contains("SinglePartition"),
        s"$k planned a global single-task window\n" + p)
    }
  }

  test("q_moment_stats broadcasts the bounded per-group stats back") {
    val p = plan("q_moment_stats")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_dq_checks: FK rule is an anti-join; row-local rules share ONE scan") {
    val p = plan("q_dq_checks")
    assert(p.contains("LeftAnti"), "fk_orphan must plan as anti-join\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("double-referenced bounded rollups are materialized once") {
    // abtest's 5-row stats, burst's hourly rollup and topn's source
    // rollup each feed two consumers; unmaterialized, every reference
    // re-scans the corpus — the checkpoint caps each plan at ≤1 scan
    for (k <- Seq("q_abtest_ttest", "q_burst_detect", "q_topn_percent")) {
      val p = plan(k)
      assert(p.sliding("FileScan".length).count(_ == "FileScan") <= 1,
        s"$k re-scans its input\n" + p)
    }
  }

  test("q_zipf_fit scans the memoized term index, not a re-derivation") {
    val p = plan("q_zipf_fit")
    assert(p.contains("Scan ExistingRDD"),
      "zipf must serve from the session term-index checkpoint\n" + p)
    assert(!p.contains("Generate explode"),
      "a fresh tokenize explode means the memo was bypassed\n" + p)
  }

  test("q_dpp_prune injects a runtime dynamic-partition-pruning filter") {
    val p = plan("q_dpp_prune")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "fact scan must carry a dynamicpruning partition filter\n" + p)
  }

  test("q_runtime_bloom gets an optimizer-injected bloom probe on the fact side") {
    val p = plan("q_runtime_bloom")
    assert(p.contains("BloomFilterMightContain") || p.contains("bloom_filter"),
      "InjectRuntimeFilter must plant a bloom probe\n" + p)
  }

  test("session-4 pair miners never go cartesian") {
    for (k <- Seq("q_freq_pairs", "q_cf_item_sim", "q_markov_transition")) {
      val p = plan(k)
      assert(!p.contains("CartesianProduct"), s"$k plans a cartesian\n" + p)
    }
  }

  test("q_grid_cluster scans the events corpus exactly once") {
    // cells are checkpointed before fan-out; CC and the final join all
    // consume the bounded cell tables, never the raw corpus again
    val p = plan("q_grid_cluster")
    assert(p.sliding("FileScan".length).count(_ == "FileScan") <= 1,
      "grid cluster re-scans its input\n" + p)
  }

  test("q_recs_topn serves from the memoized interaction matrix") {
    val p = plan("q_recs_topn")
    assert(p.contains("Scan ExistingRDD"),
      "recs must read the session memo, not re-derive\n" + p)
    assert(!p.contains("FileScan parquet") || !p.contains("lineitem"),
      "a fresh lineitem scan means the memo was bypassed\n" + p)
  }

  test("q_embed_outlier broadcasts its probe side; q_precision_recall_k reads the rank memo") {
    val p = plan("q_embed_outlier")
    assert(p.contains("BroadcastExchange"), s"q_embed_outlier must broadcast\n" + p)
    assert(!p.contains("CartesianProduct"), s"q_embed_outlier plans a cartesian\n" + p)
    // r7: q_precision_recall_k consumes the session-memoized ranked
    // top-10 table (LlmOps.rankedTop10 — the broadcast cross + window
    // now runs once per session, shared with q_ndcg); the consumer
    // plan must read the checkpointed memo, not re-derive the cross
    val prk = plan("q_precision_recall_k")
    assert(prk.contains("Scan ExistingRDD"),
      "q_precision_recall_k must read the rank memo, not re-derive\n" + prk)
    assert(!prk.contains("CartesianProduct"), "cartesian in the memo consumer\n" + prk)
  }

  test("r7 ANN/LSH keys: codebooks and distance tables broadcast, no cartesian candidates") {
    // q_pq_encode: the packed codebook is a broadcast m-row table —
    // the corpus-side assign must never shuffle on it
    val pq = plan("q_pq_encode")
    assert(pq.contains("BroadcastExchange"), "PQ codebook must broadcast\n" + pq)
    assert(!pq.contains("CartesianProduct"), "q_pq_encode cartesian\n" + pq)
    // q_ivf_pq_query: dtab lookups broadcast; only the sanctioned
    // 1-row packed-centroid crossJoins may appear
    val ivf = plan("q_ivf_pq_query")
    assert(ivf.contains("BroadcastExchange"), "ADC dtab must broadcast\n" + ivf)
    assert(!ivf.contains("CartesianProduct"), "q_ivf_pq_query cartesian\n" + ivf)
    // q_ann_rplsh: candidates come from bucket EQUI-joins, never a
    // nested-loop pair scan
    val rp = plan("q_ann_rplsh")
    assert(!rp.contains("BroadcastNestedLoopJoin") && !rp.contains("CartesianProduct"),
      "RP-LSH must join on band buckets\n" + rp)
    // q_contain_join: prefix-filtered inverted-index equi-join
    val cj = plan("q_contain_join")
    assert(!cj.contains("BroadcastNestedLoopJoin") && !cj.contains("CartesianProduct"),
      "containment must probe the inverted index\n" + cj)
  }

  test("bounded-grid stats keys aggregate BEFORE their global window") {
    // the q_auc collapse shape: the un-partitioned window must consume
    // an aggregated grid, so a HashAggregate appears below the Window
    for (k <- Seq("q_auc", "q_ks_test", "q_decile_lift")) {
      val p = plan(k)
      val wIdx = p.indexOf("Window")
      assert(wIdx >= 0, s"$k lost its window\n" + p)
      assert(p.indexOf("HashAggregate", wIdx) >= 0 ||
        p.substring(wIdx).contains("ExistingRDD"),
        s"$k's window is not over the aggregated grid\n" + p)
    }
  }

  test("r7 continuation keys: broadcasts where bounded, no accidental cartesians") {
    // q_count_min: the 1024-row counter table must broadcast to the
    // vocab-grain probe — a shuffle join there re-partitions the memo
    val cm = plan("q_count_min")
    assert(cm.contains("BroadcastExchange"), "CMS counters must broadcast\n" + cm)
    // q_negative_sampling: the interval probe is vocab-broadcast (the
    // sanctioned bounded nested-loop); draws never shuffle on a key
    val ns = plan("q_negative_sampling")
    assert(ns.contains("BroadcastExchange"), "sampler vocab must broadcast\n" + ns)
    // q_ndcg / q_classifier_report: consume session memos / bounded
    // cells — no cartesian may appear
    for (k <- Seq("q_ndcg", "q_classifier_report", "q_woe_binning",
        "q_conformal_interval", "q_sequential_ab")) {
      val p = plan(k)
      assert(!p.contains("CartesianProduct"), s"$k plans a cartesian\n" + p)
    }
    // q_gopher_rules: the only join is doc-grain left join of the
    // bigram rollup — must be a hash join, not nested-loop
    val gr = plan("q_gopher_rules")
    assert(!gr.contains("BroadcastNestedLoopJoin") && !gr.contains("CartesianProduct"),
      "gopher bigram rollup must equi-join\n" + gr)
  }

  test("r8 scale fixes hold in the plans") {
    // q_tfidf_rerank: the r7 forced broadcasts of corpus-growing sets
    // (candidate-doc population, vocabulary df table) are gone — the
    // logical plan must carry NO user hint; AQE may still broadcast
    // at runtime, which is exactly the point
    val lp = SparkEntry.queries("q_tfidf_rerank")(spark, sf)
      .queryExecution.analyzed.toString()
    assert(!lp.contains("UnresolvedHint") &&
      lp.split("ResolvedHint").length <= 2,
      "tfidf_rerank may broadcast only the 1-row corpus-count scalar\n"
        + lp.take(2000))
    // new graph/stat keys never plan a cartesian
    for (k <- Seq("q_clustering_coeff", "q_assortativity", "q_kcore",
        "q_adamic_adar", "q_kruskal_wallis", "q_levene_bf",
        "q_sim_binary_hamming")) {
      val p = plan(k)
      assert(!p.contains("CartesianProduct"), s"$k plans a cartesian\n" + p)
    }
    // the binary-hamming pack stays inside whole-stage codegen
    val bh = SparkEntry.queries("q_sim_binary_hamming")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
    assert(bh.contains("WholeStageCodegen"), bh.take(500))
  }

  test("r10 capped keys never plan a cartesian (caps themselves are " +
      "behaviorally pinned)") {
    // The 128-caps sit BEFORE eager localCheckpoints, so they are
    // invisible in these post-checkpoint plan strings — their
    // presence is pinned behaviorally instead (ExprSpec minhash
    // recall over the capped candidates, R10OpsSpec's fuzzy-lev fold
    // applying the identical cap, EdgeGraphSpec's capLowTau pins) and
    // by the sf1 numbers in BASELINE.md. Here: the join shapes stay
    // equi-joins.
    for (k <- Seq("q_minhash_lsh", "q_fuzzy_levenshtein",
        "q_substring_dup", "q_knn_shapley", "q_ecod_outlier")) {
      val p = plan(k)
      assert(!p.contains("CartesianProduct"), s"$k plans a cartesian\n" + p)
    }
  }

  test("r11 graph-ANN keys: no cartesian, beam/top-k windows per-group") {
    for (k <- Seq("q_ann_nsw", "q_ann_nsw_multi", "q_ann_nndescent")) {
      val p = plan(k)
      assert(!p.contains("CartesianProduct"), s"$k plans a cartesian\n" + p.take(2000))
    }
    // the multi-query beam must rank per qid, never globally: every
    // visible windowspec carries a partition column
    val pm = plan("q_ann_nsw_multi")
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(pm).toList
    assert(specs.forall(s => s.contains("qid") || s.contains("a_id")),
      specs.mkString("\n"))
  }

  test("PrefixSum plans its rank/cumsum partitioned by the range bucket") {
    // operators/PrefixSum: the fact-grain window must be partitioned
    // by __pid (the range bucket) — a bare Window.orderBy at that
    // grain is the single-task global sort the helper exists to kill.
    // (The ≤|parallelism|-row offsets window is the sanctioned bounded
    // single-partition leg.) Probed directly — the adopting keys
    // checkpoint their results, which hides the window from their
    // final plan strings.
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val df = spark.range(0, 1000)
      .select(col("id"), pmod(col("id"), lit(7L)).as("v"))
    val p = graft.operators.PrefixSum
      .rankAndCumSum(df, Seq(col("v"), col("id")), col("v"), "rn", "cum")
      .queryExecution.executedPlan.toString()
    assert(p.contains("Window"), p.take(1000))
    assert(p.contains("__pid"), "range-bucket window lost\n" + p.take(2000))
  }

  test("ER / layout keys carry no un-partitioned corpus-grain window") {
    // r11 VERDICT task 1: q_er_resolve used to rank the whole part
    // dimension with Window.orderBy(p_name, p_partkey) — a single-task
    // sort at 1000 executors that also evaded WindowAuditSpec's old
    // matcher. Rank now comes from PrefixSum + successor equi-joins;
    // an un-partitioned windowspecdefinition over the sort keys in any
    // of these plans means the rewrite regressed.
    for (k <- Seq("q_er_resolve", "q_sorted_neighborhood")) {
      val p = plan(k)
      assert(!p.contains("windowspecdefinition(p_name"),
        s"$k re-grew the global name-sort window\n" + p.take(2000))
    }
    for (k <- Seq("q_zorder_layout", "q_hilbert_layout")) {
      val p = plan(k)
      assert(!p.contains("ntile(16)"),
        s"$k re-grew the global ntile window (use PrefixSum.ntileExpr)\n"
          + p.take(2000))
    }
  }

  test("q_cdc_merge shuffles once per side on the merge key, window partitioned") {
    // the 100 TB upsert shape: ops ranked by a PARTITIONED window
    // (per-key grain), base ⟗ latest as a key-partitioned join —
    // never a broadcast (both sides are fact-sized at scale) and
    // never an un-partitioned window
    val p = plan("q_cdc_merge")
    // under GraftExtensions the rn=1 window rewrites to the custom
    // TopKPerGroup exec (same key partitioning, no full sort) — either
    // spelling is the partitioned per-key rank; what must NOT appear
    // is a single-partition stage
    assert(p.contains("Window") || p.contains("TopKPerGroup"), p.take(1500))
    assert(!p.contains("SinglePartition"),
      "q_cdc_merge grew a single-partition stage\n" + p.take(2000))
    assert(p.contains("FullOuter") || p.contains("full_outer"), p.take(1500))
  }

  test("q_ann_tombstone repairs the graph with broadcast anti-joins") {
    // the tombstone set is ~5% of ids (tiny) — a shuffled anti-join
    // here would re-partition the whole edge list at scale
    val p = plan("q_ann_tombstone")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(2000))
  }
}
