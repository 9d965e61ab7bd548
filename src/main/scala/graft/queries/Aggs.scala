package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.expr.GeometricMean

/** B.4 aggregations (SURVEY.md §2).
  *
  * All grouping aggregations run partial (map-side) + final — no
  * collect, no driver-side loops — so they scale with executor count.
  * Doubles are rounded to 4dp to absorb cross-engine summation-order
  * differences (SURVEY.md §7.6.2); counts/mins/maxes stay exact.
  */
object Aggs {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape — the flagship aggregation.
    "q_agg_q1" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct("o_custkey").as("cust_cnt"))
        .orderBy("o_orderpriority")),

    // Deterministic MODE per group (r5): most frequent l_quantity per
    // returnflag with an explicit smallest-value tie-break — Spark's
    // built-in mode() leaves ties unspecified, so the operator is the
    // count-then-top-1 composition (RewriteWindowTopK plans the rn=1
    // window as the sort-free bounded-heap TopKPerGroupExec). Two
    // shuffles: the (group, value) count, then the per-group top-1 —
    // both partial-aggregated; the value space bounds the intermediate.
    "q_agg_mode" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val counts = Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy(col("cnt").desc, col("l_quantity"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
        .orderBy("l_returnflag")
    }),

    "q_agg_rollup" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
        .createOrReplaceTempView("cnr_rollup")
      // SQL form: rollup + grouping() + orderBy on the grouping columns
      // trips the DataFrame-API ambiguous-self-join check in Spark 4.1.
      s.sql(
        """SELECT r_name, n_name, ROUND(SUM(c_acctbal), 4) AS acct_sum,
          |  CAST(GROUPING(r_name) AS INT) AS g_r,
          |  CAST(GROUPING(n_name) AS INT) AS g_n
          |FROM cnr_rollup
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }),

    "q_agg_cube" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("dow", expr("weekday(ts)"))
        .cube("event_type", "dow")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_first, col("dow").asc_nulls_first)),

    "q_agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty
          |FROM li_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    "q_agg_having" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 4).as("total_qty"))
        .filter(col("total_qty") > 250.0)
      val o = Tables.orders(s, d)
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")
        .orderBy("o_orderkey")
    }),

    // Boolean/conditional aggregate family: count_if, bool_and/bool_or,
    // and the SQL FILTER clause — all exact (integral quantity sums,
    // boolean outcomes), no rounding surface at all.
    "q_agg_bool" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("count_if(l_quantity > 25)").as("n_big"),
          expr("bool_and(l_quantity > 0)").as("all_pos"),
          expr("bool_or(l_discount > 0.09)").as("any_deep"),
          expr("sum(l_quantity) FILTER (WHERE l_discount > 0.05)").as("qty_deep"),
          expr("count(*) FILTER (WHERE l_tax = 0)").as("n_taxfree"))
        .orderBy("l_returnflag")),

    "q_agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_extendedprice"), col("l_discount")), 6).as("corr_pd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
        .orderBy("l_returnflag")),

    // Linear-regression aggregates (regr_* family, Spark 3.4+): price
    // as a linear function of quantity per returnflag. Ranking /
    // grading signals for corpus curation come out of exactly this
    // shape (quality score vs length, loss vs doc size).
    "q_agg_regr" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("icept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n"))
        .orderBy("l_returnflag")),

    // Incremental aggregate maintenance (r5): merge a BASE aggregate
    // (events before the cutoff — the already-materialized history)
    // with a DELTA aggregate (the new partition) by combining partial
    // states — counts and sums add, avg re-derives — without ever
    // rescanning the base rows. The algebraic-reaggregation pattern
    // every incremental ETL depends on (the exact-counter sibling of
    // q_hll_sketch's sketch mergeability); the oracle computes the
    // full aggregate from scratch, so equality proves the merge
    // lossless. Sums round 4dp: base+delta adds doubles in a
    // different order than one full pass (§7.6.2).
    "q_incremental_agg" -> ((s, d) => {
      val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
      val e = Tables.events(s, d)
      def part(df: DataFrame): DataFrame = df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      part(e.filter(col("ts") < cutoff))
        .unionByName(part(e.filter(col("ts") >= cutoff)))
        .groupBy("event_type")
        .agg(sum("n").as("n"),
          round(sum("sv"), 4).as("sum_value"),
          round(sum("sv") / sum("n"), 4).as("avg_value"))
        .orderBy("event_type")
    }),

    // Salted distinct count (r5): COUNT(DISTINCT user_id) per
    // event_type via two-phase salting — the skew-mitigation shape for
    // low-cardinality group keys (5 event types over 32+ shuffle
    // partitions leave most of the cluster idle, and one hot key can
    // OOM its reducer). Phase 1 groups by (type, salt) where the salt
    // is derived FROM THE DISTINCT KEY (pmod(hash(user_id), 64)) so
    // each user lands in exactly one salt bucket and the partial
    // distinct counts are disjoint; phase 2 sums the partials — exact,
    // not approximate, unlike the HLL route. The salt spreads the
    // phase-1 shuffle 64× while phase 2 moves only 5×64 tiny rows.
    // The oracle is the plain one-phase COUNT(DISTINCT), so equality
    // proves the salting semantics-preserving.
    "q_salted_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          pmod(hash(col("user_id")), lit(64)).as("salt"), col("user_id"))
        .groupBy("event_type", "salt")
        .agg(countDistinct("user_id").as("pd"))
        .groupBy("event_type")
        .agg(sum("pd").as("n_users"))
        .orderBy("event_type")),

    // Mergeable heavy-hitters sketch (r5): per-event-type approx_top_k
    // ACCUMULATE states combined into one global state, then the top-5
    // value buckets estimated from the merged sketch — the
    // reaggregatable frequent-items pattern (per-partition/day states
    // merge without rescans; the sibling of q_hll_sketch for counts
    // instead of distincts). Capacity 100 ≥ the 39 distinct buckets,
    // so the DataSketches frequent-items state is EXACT here — which
    // is what makes a real DuckDB oracle possible: the top-5 counts
    // are well separated at every sf, so the estimate equals the exact
    // GROUP BY top-5. At corpus scale (capacity < cardinality) the
    // same plan degrades gracefully to ±ε·N guarantees.
    "q_approx_topk" -> ((s, d) => {
      val per = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") / 10.0).cast("int").as("bucket"))
        .groupBy("event_type")
        .agg(expr("approx_top_k_accumulate(bucket, 100)").as("sk"))
      per.agg(expr("approx_top_k_estimate(approx_top_k_combine(sk), 5)").as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.item").as("bucket"), col("t.count").as("cnt"))
        .orderBy(col("cnt").desc, col("bucket"))
    }),

    // Mergeable quantile sketch (KLL, DataSketches): the
    // reaggregatable DISTRIBUTION sibling of q_hll_sketch (distinct
    // counts) and q_approx_topk (heavy hitters), and the concrete form
    // of §7.5's documented fallback for when even the distinct-value
    // domain behind ExactQuantiles explodes. BASE and DELTA event
    // slices sketch independently (partial agg carries the mergeable
    // state), the states combine with kll_merge_agg_double — no base
    // rescan, the incremental-maintenance shape of q_incremental_agg —
    // and p50/p95/rank-at-median read off the merged sketch. No DuckDB
    // oracle (probabilistic-sketch family, sanctioned OMIT):
    // R6OpsSpec pins merge-losslessness (merged == whole-corpus
    // sketch) and the KLL rank-error envelope vs the exact quantiles.
    "q_kll_quantile" -> ((s, d) => {
      val parts = Tables.events(s, d)
        .withColumn("slice",
          when(pmod(col("event_id"), lit(4)) === 0, "delta").otherwise("base"))
        .groupBy("event_type", "slice")
        .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"))
      parts.groupBy("event_type")
        .agg(expr("kll_merge_agg_double(sk, 200)").as("mk"),
          count(lit(1)).as("n_slices"))
        .select(col("event_type"), col("n_slices"),
          expr("kll_sketch_get_n_double(mk)").as("n_events"),
          round(expr("kll_sketch_get_quantile_double(mk, 0.5)"), 4).as("p50"),
          round(expr("kll_sketch_get_quantile_double(mk, 0.95)"), 4).as("p95"))
        .orderBy("event_type")
    }),

    // HLL sketch — no DuckDB oracle (sketch-specific); unit test bounds
    // it to within 5% of the exact distinct count.
    "q_agg_approx_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct("user_id").as("approx_users"))
        .orderBy("event_type")),

    "q_udaf_gmean" -> ((s, d) => {
      val gm = udaf(GeometricMean)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(gm(col("l_extendedprice")), 4).as("gmean_price"))
        .orderBy("l_returnflag")
    }),

    // Count-min sketch (Cormode & Muthukrishnan) — the mergeable
    // frequency sketch, built with DETERMINISTIC md5 row hashes so
    // the 4×256 counter array is a pure function of the data and the
    // DuckDB twin rebuilds it exactly: the ORACLED counterpoint to
    // the engine-internal OMIT sketches (kll/hll). Counters derive
    // from the session-memoized term table (counter = Σ counts of the
    // terms hashing into it — identical to streaming the tokens);
    // per-term estimate = min over its 4 counters, which can only
    // overcount. Output: the 20 true-heaviest terms with estimate and
    // overcount. Scale shape: vocab-grain rows + a broadcast 1024-row
    // counter table; the corpus-sized work is the one memoized
    // explode.
    "q_count_min" -> ((s, d) => {
      val terms = graft.operators.EdgeGraph.termFreq(s, d)
        .groupBy("term").agg(sum("tf_raw").as("n"))
      val rows = terms
        .select(col("term"), col("n"), explode(expr("sequence(0, 3)")).as("r"))
        .withColumn("bkt",
          conv(substring(md5(concat(col("r").cast("string"), lit("|"),
            col("term"))), 1, 4), 16, 10).cast("int") % 256)
        .localCheckpoint(eager = true) // vocab-bounded; feeds counters + probe
      val counters = rows.groupBy("r", "bkt").agg(sum("n").as("c"))
      rows.join(broadcast(counters), Seq("r", "bkt"))
        .groupBy("term", "n").agg(min("c").as("est"))
        .select(col("term"), col("n").as("true_n"), col("est").as("est_n"),
          (col("est") - col("n")).as("overcount"))
        .orderBy(col("true_n").desc, col("term")).limit(20)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_count_min" ->
      """WITH tc AS (
        |  SELECT w AS term, COUNT(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1),
        |rws AS (
        |  SELECT term, n, r,
        |    CAST(CAST('0x' || substring(md5(CAST(r AS VARCHAR) || '|' || term),
        |      1, 4) AS INT) % 256 AS INT) AS bkt
        |  FROM tc, unnest(generate_series(0, 3)) AS t(r)),
        |counters AS (SELECT r, bkt, CAST(SUM(n) AS BIGINT) AS c
        |             FROM rws GROUP BY 1, 2),
        |est AS (SELECT term, n, MIN(c) AS est
        |        FROM rws JOIN counters USING (r, bkt) GROUP BY 1, 2)
        |SELECT term, n AS true_n, CAST(est AS BIGINT) AS est_n,
        |  CAST(est - n AS BIGINT) AS overcount
        |FROM est ORDER BY true_n DESC, term LIMIT 20""".stripMargin,

    // full-scratch aggregate — equality proves the partial-state merge
    "q_incremental_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 4) AS sum_value,
        |  ROUND(SUM(value) / COUNT(*), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_mode" ->
      """SELECT l_returnflag, mode_qty, cnt FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, COUNT(*) AS cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY COUNT(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "q_agg_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 4) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS cust_cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // exact GROUP BY top-5 — valid oracle because sketch capacity
    // exceeds bucket cardinality (state exact) and the top-5 counts
    // are separated at every sf
    "q_approx_topk" ->
      """SELECT bucket, cnt FROM (
        |  SELECT CAST(floor(value / 10.0) AS INT) AS bucket, COUNT(*) AS cnt
        |  FROM events GROUP BY 1)
        |ORDER BY cnt DESC, bucket LIMIT 5""".stripMargin,

    // plain one-phase formulation — equality proves the salted
    // two-phase rewrite exact
    "q_salted_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_rollup" ->
      """SELECT r_name, n_name, ROUND(SUM(c_acctbal), 4) AS acct_sum,
        |  CAST(GROUPING(r_name) AS INT) AS g_r,
        |  CAST(GROUPING(n_name) AS INT) AS g_n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT event_type, dow, COUNT(*) AS n
        |FROM (SELECT event_type, CAST(isodow(ts) - 1 AS INT) AS dow FROM events)
        |GROUP BY CUBE (event_type, dow)
        |ORDER BY event_type ASC NULLS FIRST, dow ASC NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_having" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, total_qty
        |FROM (SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING ROUND(SUM(l_quantity), 4) > 250.0) big
        |JOIN orders ON big.l_orderkey = o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_agg_regr" ->
      """SELECT l_returnflag,
        |  ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |  ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_bool" ->
      """SELECT l_returnflag,
        |  CAST(count_if(l_quantity > 25) AS BIGINT) AS n_big,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.09) AS any_deep,
        |  SUM(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_deep,
        |  COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  ROUND(var_samp(l_discount), 6) AS var_disc,
        |  ROUND(corr(l_extendedprice, l_discount), 6) AS corr_pd,
        |  ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_udaf_gmean" ->
      """SELECT l_returnflag,
        |  ROUND(EXP(AVG(LN(l_extendedprice))), 4) AS gmean_price
        |FROM lineitem WHERE l_extendedprice > 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
