package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 28 (SURVEY.md §2 B.10b): retrieval/classifier
  * evaluation and a ratio-metric inference key — MRR and MAP@10 of a
  * popularity-ranked brand recommender against a temporal holdout
  * (train < 1998-01-01, test ≥, stated), the classifier KS statistic
  * and a cost-optimal threshold sweep over the centi-snapped event
  * score grid, the Murphy decomposition of the Brier score on
  * milli-snapped predictions, and the delta-method CI for the
  * revenue-per-event ratio metric clustered by user.
  *
  * Exactness posture (the r9 convention): every ranking, cumulative
  * count and moment stays in longs/decimals on BOTH engines; doubles
  * appear only in one final arithmetic chain per key, rounded to 6dp.
  * Scale posture: everything is a per-key rollup (user×brand,
  * distinct-score grid, 10 bins, per-user moments) — no all-pairs
  * anywhere; the rank windows partition by user/nothing-bounded
  * grids, so a 1000-executor run shuffles only aggregate-sized rows.
  */
object StatsR9zb {

  /** Per-(customer, brand) purchase counts in the train half and the
    * distinct test-half pairs: the popularity recommender's inputs.
    * Both are user×brand aggregates — at 100 TB this is the bounded
    * rollup grain, never the raw lineitem grain.
    */
  private[graft] def trainTest(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // session-memoized (r13 opt): five keys (q_mrr, q_hit_rate,
    // q_catalog_coverage, q_cold_start, ...) each re-ran the 3-way
    // join + both rollups per call; exact-integer aggregates + a
    // deterministic date split, so the memoized halves are
    // byte-identical to a fresh derivation
    def li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("c"), col("p_brand").as("brand"),
        col("o_orderdate"))
    val cut = lit("1998-01-01").cast("timestamp_ntz")
    val train = graft.util.SessionMemo.of(s, s"ttTrain:$d") {
      li.filter(col("o_orderdate") < cut)
        .groupBy("c", "brand").agg(count(lit(1)).as("cnt"))
    }
    val test = graft.util.SessionMemo.of(s, s"ttTest:$d") {
      li.filter(col("o_orderdate") >= cut)
        .select("c", "brand").distinct()
    }
    (train, test)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Mean reciprocal rank of the popularity recommender: per user,
    // train brands ranked by (cnt DESC, brand ASC — total order);
    // reciprocal of the FIRST rank whose brand reappears in the test
    // half, 0 when none does. Averaged over users active in BOTH
    // halves (stated). The 1/r sum is a DOUBLE chain on both engines
    // (ranks are unbounded so no finite lcm clears them); 6dp parity
    // holds because both engines sum the identical reciprocal set —
    // the oracle mirrors the same 1.0/first_rk double expression.
    "q_mrr" -> ((s, d) => {
      val (train, test) = trainTest(s, d)
      val w = Window.partitionBy("c").orderBy(col("cnt").desc, col("brand").asc)
      val ranked = train.withColumn("rk", row_number().over(w))
      val evalUsers = train.select("c").distinct()
        .join(test.select("c").distinct(), "c")
      val firstHit = ranked.join(test, Seq("c", "brand"))
        .groupBy("c").agg(min("rk").as("first_rk"))
      evalUsers.join(firstHit, Seq("c"), "left")
        .agg(count(lit(1)).as("n_users"),
          count("first_rk").as("n_hit"),
          sum(when(col("first_rk").isNotNull,
            lit(1.0) / col("first_rk")).otherwise(lit(0.0))).as("rr_sum"))
        .select(col("n_users"), col("n_hit"),
          round(col("rr_sum") / col("n_users"), 6).as("mrr"))
    }),

    // MAP@10 on the same holdout: AP numerator kept exact via the
    // lcm(1..10)=2520 clearing — each hit at rank r contributes
    // hits_so_far·(2520/r) to a per-user LONG, divided once by
    // 2520·min(10, |test brands|). Users with both halves, AP=0 when
    // no top-10 hit (stated).
    "q_map_at_k" -> ((s, d) => {
      val (train, test) = trainTest(s, d)
      val w = Window.partitionBy("c").orderBy(col("cnt").desc, col("brand").asc)
      val ranked = train.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
      val hitW = Window.partitionBy("c").orderBy("rk")
      val apNum = ranked.join(test, Seq("c", "brand"))
        .withColumn("hits_at", count(lit(1)).over(
          hitW.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("c")
        .agg(sum(col("hits_at") * (lit(2520L) / col("rk")).cast("long"))
          .as("ap_num"))
      val nRel = test.groupBy("c").agg(count(lit(1)).as("n_rel"))
      val evalUsers = train.select("c").distinct()
        .join(test.select("c").distinct(), "c")
      evalUsers.join(nRel, Seq("c"))
        .join(apNum, Seq("c"), "left")
        .select(col("c"),
          (coalesce(col("ap_num"), lit(0L)).cast("double")
            / (lit(2520.0) * least(lit(10L), col("n_rel")))).as("ap"))
        .agg(count(lit(1)).as("n_users"),
          round(sum("ap") / count(lit(1)), 6).as("map_10"))
    }),

    // Classifier KS: score = centi-snapped event value, positive =
    // purchase. Cumulative per distinct score, KS numerator
    // |cp·N − cn·P| stays long; threshold = the smallest score
    // attaining the max (stated). One row: totals, KS, threshold.
    "q_ks_classifier" -> ((s, d) => {
      val g = Tables.events(s, d)
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("v")
        .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))
      // bounded grain: distinct quantized cent values (generator grid)
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = g
        .withColumn("cp", sum("pos").over(w))
        .withColumn("cn", sum("neg").over(w))
      val tot = cum.agg(max("cp").as("p_tot"), max("cn").as("n_tot"))
      cum.crossJoin(broadcast(tot))
        .withColumn("diff_num",
          abs(col("cp") * col("n_tot") - col("cn") * col("p_tot")))
        .orderBy(col("diff_num").desc, col("v").asc)
        .limit(1)
        .select(col("p_tot").as("n_pos"), col("n_tot").as("n_neg"),
          round(col("diff_num").cast("double")
            / (col("p_tot") * col("n_tot")), 6).as("ks"),
          round(col("v") / 100.0, 2).as("ks_threshold"))
    }),

    // Cost-optimal operating point: predict positive when score ≥ t,
    // FP costs 1, FN costs 5 (stated); t sweeps the distinct-score
    // grid. FP/FN come from strictly-below cumulative counts (longs);
    // min cost, smallest t tie-break (stated). The all-negative
    // baseline cost 5·P is emitted for lift context.
    "q_confusion_costs" -> ((s, d) => {
      val g = Tables.events(s, d)
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("v")
        .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))
      // bounded grain: distinct quantized cent values (generator grid)
      val wB = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = g.agg(sum("pos").as("p_tot"), sum("neg").as("n_tot"))
      g.withColumn("pos_below", coalesce(sum("pos").over(wB), lit(0L)))
        .withColumn("neg_below", coalesce(sum("neg").over(wB), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("fp", col("n_tot") - col("neg_below"))
        .withColumn("fn", col("pos_below"))
        .withColumn("cost", col("fp") + lit(5L) * col("fn"))
        .orderBy(col("cost").asc, col("v").asc)
        .limit(1)
        .select(round(col("v") / 100.0, 2).as("best_threshold"),
          col("fp"), col("fn"), col("cost"),
          (lit(5L) * col("p_tot")).as("baseline_cost"))
    }),

    // Murphy decomposition of the Brier score: prediction snapped to
    // milli-units p = min(round(value·5), 999)/1000 (stated — the
    // calibration_bins scorer on an exact grid), bin = p_milli DIV
    // 100. Bin sums are LONGS; REL/RES/UNC come out of one double
    // chain, with brier_check = REL − RES + UNC.
    "q_brier_decomp" -> ((s, d) => {
      val b = Tables.events(s, d)
        .select(least(round(col("value") * 5).cast("long"), lit(999L)).as("pm"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy((col("pm") / 100).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_k"), sum("pm").as("sp_k"), sum("y").as("sy_k"))
      val tot = b.agg(sum("n_k").as("n"), sum("sy_k").as("p"))
      b.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_k"), col("sp_k"), col("sy_k"),
          col("n"), col("p"))
        .agg(max("n").as("nn"),
          round(max(col("p").cast("double") / col("n"))
            * (lit(1.0) - max(col("p").cast("double") / col("n"))), 6)
            .as("unc"),
          round(sum(col("n_k")
            * pow(col("sp_k").cast("double") / (col("n_k") * 1000.0)
              - col("sy_k").cast("double") / col("n_k"), 2))
            / max("n"), 6).as("rel"),
          round(sum(col("n_k")
            * pow(col("sy_k").cast("double") / col("n_k")
              - col("p").cast("double") / col("n"), 2))
            / max("n"), 6).as("res"))
        .select(col("nn").as("n"), col("rel"), col("res"), col("unc"),
          round(col("rel") - col("res") + col("unc"), 6).as("brier_check"))
    }),

    // Delta-method CI for the ratio metric revenue-per-event,
    // clustered by user: per-user x = Σ centi-revenue over purchase
    // events, n = all events. Moment sums Σx, Σn, Σx², Σn², Σxn in
    // DECIMAL(38,0) (x² crosses 2^63 on long corpora); R = Σx/Σn,
    // Var(R) = (Sxx − 2R·Sxn + R²·Snn)/(m·n̄²) with sample
    // (co)variances, CI = R ± 1.96·se. One double chain, 6dp.
    "q_delta_method" -> ((s, d) => {
      val u = Tables.events(s, d)
        .select(col("user_id"),
          when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L).as("xc"))
        .groupBy("user_id")
        .agg(sum("xc").as("x"), count(lit(1)).as("n"))
      u.agg(count(lit(1)).as("m"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("n").cast("decimal(38,0)")).as("sn"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("n").cast("decimal(38,0)") * col("n")).as("snn"),
          sum(col("x").cast("decimal(38,0)") * col("n")).as("sxn"))
        .select(col("m"),
          (col("sx").cast("double") / col("sn").cast("double")).as("r"),
          ((col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double") / col("m"))
            / (col("m") - 1)).as("vx"),
          ((col("snn").cast("double")
            - col("sn").cast("double") * col("sn").cast("double") / col("m"))
            / (col("m") - 1)).as("vn"),
          ((col("sxn").cast("double")
            - col("sx").cast("double") * col("sn").cast("double") / col("m"))
            / (col("m") - 1)).as("vxn"),
          (col("sn").cast("double") / col("m")).as("nbar"))
        .select(col("m"), col("r"),
          sqrt((col("vx") - lit(2.0) * col("r") * col("vxn")
            + col("r") * col("r") * col("vn"))
            / (col("m") * col("nbar") * col("nbar"))).as("se"))
        .select(col("m"),
          round(col("r") / 100.0, 6).as("ratio_dollars"),
          round(col("se") / 100.0, 6).as("se_dollars"),
          round((col("r") - lit(1.96) * col("se")) / 100.0, 6).as("ci_lo"),
          round((col("r") + lit(1.96) * col("se")) / 100.0, 6).as("ci_hi"))
    })
  )

  val oracle: Map[String, String] = Map(
    // identical rank window + temporal split
    "q_mrr" ->
      """WITH li AS (
        |  SELECT o.o_custkey AS c, p.p_brand AS brand, o.o_orderdate AS od
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey),
        |train AS (
        |  SELECT c, brand, COUNT(*) AS cnt FROM li
        |  WHERE od < TIMESTAMP '1998-01-01' GROUP BY 1, 2),
        |test AS (
        |  SELECT DISTINCT c, brand FROM li
        |  WHERE od >= TIMESTAMP '1998-01-01'),
        |ranked AS (
        |  SELECT c, brand,
        |    ROW_NUMBER() OVER (PARTITION BY c ORDER BY cnt DESC, brand)
        |      AS rk
        |  FROM train),
        |eu AS (
        |  SELECT DISTINCT t.c FROM (SELECT DISTINCT c FROM train) t
        |  JOIN (SELECT DISTINCT c FROM test) s ON t.c = s.c),
        |fh AS (
        |  SELECT r.c, MIN(r.rk) AS first_rk
        |  FROM ranked r JOIN test t ON r.c = t.c AND r.brand = t.brand
        |  GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(COUNT(fh.first_rk) AS BIGINT) AS n_hit,
        |  ROUND(SUM(CASE WHEN fh.first_rk IS NOT NULL
        |      THEN 1.0 / fh.first_rk ELSE 0.0 END) / COUNT(*), 6) AS mrr
        |FROM eu LEFT JOIN fh ON eu.c = fh.c""".stripMargin,

    // identical 2520-cleared AP numerator
    "q_map_at_k" ->
      """WITH li AS (
        |  SELECT o.o_custkey AS c, p.p_brand AS brand, o.o_orderdate AS od
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey),
        |train AS (
        |  SELECT c, brand, COUNT(*) AS cnt FROM li
        |  WHERE od < TIMESTAMP '1998-01-01' GROUP BY 1, 2),
        |test AS (
        |  SELECT DISTINCT c, brand FROM li
        |  WHERE od >= TIMESTAMP '1998-01-01'),
        |ranked AS (
        |  SELECT * FROM (
        |    SELECT c, brand,
        |      ROW_NUMBER() OVER (PARTITION BY c ORDER BY cnt DESC, brand)
        |        AS rk
        |    FROM train) WHERE rk <= 10),
        |hits AS (
        |  SELECT r.c, r.rk,
        |    COUNT(*) OVER (PARTITION BY r.c ORDER BY r.rk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS hits_at
        |  FROM ranked r JOIN test t ON r.c = t.c AND r.brand = t.brand),
        |ap AS (
        |  SELECT c, SUM(hits_at * (2520 // rk)) AS ap_num
        |  FROM hits GROUP BY 1),
        |nrel AS (SELECT c, COUNT(*) AS n_rel FROM test GROUP BY 1),
        |eu AS (
        |  SELECT DISTINCT t.c FROM (SELECT DISTINCT c FROM train) t
        |  JOIN (SELECT DISTINCT c FROM test) s ON t.c = s.c)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  ROUND(SUM(CAST(COALESCE(ap.ap_num, 0) AS DOUBLE)
        |    / (2520.0 * LEAST(10, nrel.n_rel))) / COUNT(*), 6) AS map_10
        |FROM eu JOIN nrel ON eu.c = nrel.c
        |LEFT JOIN ap ON eu.c = ap.c""".stripMargin,

    // identical long KS numerator on the centi grid
    "q_ks_classifier" ->
      """WITH g AS (
        |  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS pos,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
        |      AS neg
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    SUM(pos) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |    SUM(neg) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        |  FROM g),
        |tot AS (SELECT MAX(cp) AS p_tot, MAX(cn) AS n_tot FROM cum)
        |SELECT CAST(p_tot AS BIGINT) AS n_pos,
        |  CAST(n_tot AS BIGINT) AS n_neg,
        |  ROUND(CAST(ABS(cp * n_tot - cn * p_tot) AS DOUBLE)
        |    / (p_tot * n_tot), 6) AS ks,
        |  ROUND(v / 100.0, 2) AS ks_threshold
        |FROM cum, tot
        |ORDER BY ABS(cp * n_tot - cn * p_tot) DESC, v ASC LIMIT 1""".stripMargin,

    // identical strictly-below cumulative cost sweep
    "q_confusion_costs" ->
      """WITH g AS (
        |  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS pos,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
        |      AS neg
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    COALESCE(SUM(pos) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS pos_below,
        |    COALESCE(SUM(neg) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS neg_below
        |  FROM g),
        |tot AS (SELECT SUM(pos) AS p_tot, SUM(neg) AS n_tot FROM g)
        |SELECT ROUND(v / 100.0, 2) AS best_threshold,
        |  CAST(n_tot - neg_below AS BIGINT) AS fp,
        |  CAST(pos_below AS BIGINT) AS fn,
        |  CAST(n_tot - neg_below + 5 * pos_below AS BIGINT) AS cost,
        |  CAST(5 * p_tot AS BIGINT) AS baseline_cost
        |FROM cum, tot
        |ORDER BY n_tot - neg_below + 5 * pos_below ASC, v ASC
        |LIMIT 1""".stripMargin,

    // identical milli-snapped Murphy decomposition
    "q_brier_decomp" ->
      """WITH b AS (
        |  SELECT LEAST(CAST(ROUND(value * 5) AS BIGINT), 999) // 100
        |      AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n_k,
        |    SUM(LEAST(CAST(ROUND(value * 5) AS BIGINT), 999)) AS sp_k,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS sy_k
        |  FROM events GROUP BY 1),
        |tot AS (SELECT SUM(n_k) AS n, SUM(sy_k) AS p FROM b)
        |SELECT CAST(MAX(n) AS BIGINT) AS n,
        |  ROUND(SUM(n_k * POW(CAST(sp_k AS DOUBLE) / (n_k * 1000.0)
        |    - CAST(sy_k AS DOUBLE) / n_k, 2)) / MAX(n), 6) AS rel,
        |  ROUND(SUM(n_k * POW(CAST(sy_k AS DOUBLE) / n_k
        |    - CAST(p AS DOUBLE) / n, 2)) / MAX(n), 6) AS res,
        |  ROUND(MAX(CAST(p AS DOUBLE) / n)
        |    * (1.0 - MAX(CAST(p AS DOUBLE) / n)), 6) AS unc,
        |  ROUND(ROUND(SUM(n_k * POW(CAST(sp_k AS DOUBLE) / (n_k * 1000.0)
        |      - CAST(sy_k AS DOUBLE) / n_k, 2)) / MAX(n), 6)
        |    - ROUND(SUM(n_k * POW(CAST(sy_k AS DOUBLE) / n_k
        |      - CAST(p AS DOUBLE) / n, 2)) / MAX(n), 6)
        |    + ROUND(MAX(CAST(p AS DOUBLE) / n)
        |      * (1.0 - MAX(CAST(p AS DOUBLE) / n)), 6), 6)
        |    AS brier_check
        |FROM b, tot""".stripMargin,

    // identical HUGEINT moment sums and delta chain
    "q_delta_method" ->
      """WITH u AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS x,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(n AS HUGEINT)) AS sn,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(n AS HUGEINT) * n) AS snn,
        |    SUM(CAST(x AS HUGEINT) * n) AS sxn
        |  FROM u),
        |d AS (
        |  SELECT m,
        |    CAST(sx AS DOUBLE) / CAST(sn AS DOUBLE) AS r,
        |    (CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / m) / (m - 1)
        |      AS vx,
        |    (CAST(snn AS DOUBLE)
        |      - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / m) / (m - 1)
        |      AS vn,
        |    (CAST(sxn AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sn AS DOUBLE) / m) / (m - 1)
        |      AS vxn,
        |    CAST(sn AS DOUBLE) / m AS nbar
        |  FROM m),
        |e AS (
        |  SELECT m, r,
        |    sqrt((vx - 2.0 * r * vxn + r * r * vn)
        |      / (m * nbar * nbar)) AS se
        |  FROM d)
        |SELECT m, ROUND(r / 100.0, 6) AS ratio_dollars,
        |  ROUND(se / 100.0, 6) AS se_dollars,
        |  ROUND((r - 1.96 * se) / 100.0, 6) AS ci_lo,
        |  ROUND((r + 1.96 * se) / 100.0, 6) AS ci_hi
        |FROM e""".stripMargin
  )
}
