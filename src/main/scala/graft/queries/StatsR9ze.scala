package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 31 (SURVEY.md §2 B.10b): distributional inequality
  * over per-customer revenue — Atkinson (ε=1), the Palma ratio,
  * the Hoover/Robin-Hood index, and a between/within Theil
  * decomposition by customer nation — plus the Törnqvist price index
  * over the laspeyres brand halves and a Weibull shape/scale fit of
  * time-to-first-purchase by Benard median-rank regression.
  *
  * Exactness: per-row log terms snap once to the 1e6/1e9 grid (the
  * q_theil_index convention) so every cross-row sum is a LONG; mean
  * ratios stay exact rationals; one double chain per key. Scale: the
  * working grain is per-customer / per-brand / per-user rollups —
  * the windows rank bounded aggregates, never raw facts.
  */
object StatsR9ze {

  /** Per-customer revenue cents (x > 0 stated, true of the data). */
  // session-memoized (r13 opt): 12 inequality/concentration keys
  // re-ran this lineitem ⋈ orders + customer rollup per call
  private[graft] def custRev(s: SparkSession, d: String): DataFrame =
    graft.util.SessionMemo.of(s, s"custRev:$d") {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("x"))
        .filter(col("x") > 0)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Atkinson ε=1: A = 1 − geomean/mean with per-customer ln(x)
    // snapped to the 1e6 grid (stated), the mean an exact rational.
    "q_atkinson" -> ((s, d) => {
      custRev(s, d)
        .select(round(log("x") * 1e6).cast("long").as("lg"), col("x"))
        .agg(count(lit(1)).as("n"), sum("lg").as("slg"), sum("x").as("sx"))
        .select(col("n").as("n_customers"),
          round(lit(1.0) - exp(col("slg").cast("double")
              / (col("n") * 1e6))
            * col("n") / col("sx"), 6).as("atkinson_1"))
    }),

    // Palma ratio: top-10% revenue share over bottom-40% share,
    // ranks on (x, custkey) ascending, cuts at n DIV 10 / 4·n DIV 10
    // (stated integer cuts).
    "q_palma" -> ((s, d) => {
      // customer-grain global rank → range-partitioned (r10 VERDICT
      // task 4); totals read the cheap checkpointed rank table
      val ranked = graft.operators.PrefixSum.rank(custRev(s, d),
        Seq(col("x").asc, col("c").asc), "rk")
      val tot = ranked.agg(max("rk").as("n"), sum("x").as("sx"))
      ranked.crossJoin(broadcast(tot))
        .agg(max("n").as("n_customers"), max("sx").as("s_all"),
          sum(when(expr("rk <= (4 * n) div 10"), col("x"))
            .otherwise(0L)).as("b40"),
          sum(when(expr("rk > n - (n div 10)"), col("x"))
            .otherwise(0L)).as("t10"))
        .select(col("n_customers"),
          round(col("b40").cast("double") / col("s_all"), 6)
            .as("bottom40_share"),
          round(col("t10").cast("double") / col("s_all"), 6)
            .as("top10_share"),
          round(col("t10").cast("double") / col("b40"), 6).as("palma"))
    }),

    // Hoover index: Σ|n·x_i − S| / (2·n·S) — the numerator in
    // DECIMAL(38,0)/HUGEINT (n·x crosses 2^63 on long corpora).
    "q_hoover" -> ((s, d) => {
      val cr = custRev(s, d)
      val tot = cr.agg(count(lit(1)).as("n"), sum("x").as("sx"))
      cr.crossJoin(broadcast(tot))
        .select(abs(col("n").cast("decimal(38,0)") * col("x")
          - col("sx")).as("dev"), col("n"), col("sx"))
        .agg(max("n").as("n_customers"), max("sx").as("sx"),
          sum("dev").as("sdev"))
        .select(col("n_customers"),
          round(col("sdev").cast("double")
            / (lit(2.0) * col("n_customers") * col("sx")), 6)
            .as("hoover"))
    }),

    // Theil decomposition by customer nation: T_total via the
    // q_theil_index per-row 1e9 snap over customers, T_between from
    // exact per-nation (N_g, S_g), T_within = T − T_between.
    "q_theil_decomp" -> ((s, d) => {
      val cr = custRev(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("c") === col("c_custkey"))
        .select(col("c"), col("x"), col("c_nationkey").as("g"))
        .localCheckpoint(eager = true)
      val tot = cr.agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val total = cr.crossJoin(broadcast(tot))
        .withColumn("mu", col("sx").cast("double") / col("n"))
        .withColumn("t_u",
          round(col("x") / col("mu") * log(col("x") / col("mu")) * 1e9)
            .cast("long"))
        .agg(max("n").as("n"), max("sx").as("sx"), sum("t_u").as("st"))
      val grp = cr.groupBy("g")
        .agg(count(lit(1)).as("ng"), sum("x").as("sg"))
      val between = grp.crossJoin(broadcast(tot))
        .select((col("sg").cast("double") / col("sx")
          * log((col("sg").cast("double") / col("ng"))
            / (col("sx").cast("double") / col("n")))).as("bterm"),
          col("g"))
        .agg(count(lit(1)).as("n_groups"), sum("bterm").as("tb"))
      total.crossJoin(broadcast(between))
        .select(col("n").as("n_customers"), col("n_groups"),
          round(col("st") / 1e9 / col("n"), 6).as("theil_total"),
          round(col("tb"), 6).as("theil_between"),
          round(col("st") / 1e9 / col("n") - col("tb"), 6)
            .as("theil_within"))
    }),

    // Törnqvist index over the laspeyres brand halves: per-brand
    // term w̄·ln(s1·q0/(s0·q1)) snapped to the 1e9 grid (stated),
    // T = exp(Σ terms).
    "q_tornqvist" -> ((s, d) => {
      val j = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("half",
          when(col("l_shipdate") < lit("1996-01-01").cast("date"), 0)
            .otherwise(1))
        .groupBy("p_brand", "half")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("sc"),
          sum(col("l_quantity").cast("long")).as("qq"))
      val b0 = j.filter(col("half") === 0)
        .select(col("p_brand"), col("sc").as("s0"), col("qq").as("q0"))
      val b1 = j.filter(col("half") === 1)
        .select(col("p_brand"), col("sc").as("s1"), col("qq").as("q1"))
      val both = b0.join(b1, "p_brand")
        .filter(col("q0") > 0 && col("q1") > 0
          && col("s0") > 0 && col("s1") > 0)
        .localCheckpoint(eager = true)
      val tot = both.agg(sum("s0").as("t0"), sum("s1").as("t1"))
      both.crossJoin(broadcast(tot))
        .withColumn("term_u",
          round((col("s0").cast("double") / col("t0")
            + col("s1").cast("double") / col("t1")) / 2
            * log(col("s1").cast("double") * col("q0")
              / (col("s0").cast("double") * col("q1"))) * 1e9)
            .cast("long"))
        .agg(count(lit(1)).as("n_brands"), sum("term_u").as("slt"))
        .select(col("n_brands"),
          round(exp(col("slt") / 1e9), 6).as("tornqvist_idx"))
    }),

    // Weibull shape/scale of minutes-to-first-purchase per user by
    // Benard median-rank regression: F_i = (i−0.3)/(n+0.4) on the
    // (t, user) ascending rank, BOTH regression coordinates µ-snapped
    // to longs (x=ln t, y=ln(−ln(1−F))), cleared moments; shape =
    // slope, scale = exp(−intercept/shape).
    "q_weibull_mrr" -> ((s, d) => {
      val t = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("tp"))
        .filter(col("tp").isNotNull)
        .withColumn("t_min", expr("(tp - t0) div 60000000"))
        .filter(col("t_min") >= 1)
      // user-grain global rank → range-partitioned (r10 VERDICT
      // task 4); nn = max rank off the cheap checkpointed rank table
      val ranked = graft.operators.PrefixSum.rank(t,
        Seq(col("t_min").asc, col("user_id").asc), "i")
      val pts = ranked
        .crossJoin(broadcast(ranked.agg(max("i").as("nn"))))
        .select(round(log(col("t_min").cast("double")) * 1e6)
            .cast("long").as("xu"),
          round(log(-log(lit(1.0) - (col("i") - lit(0.3))
            / (col("nn") + lit(0.4)))) * 1e6).cast("long").as("yu"))
      pts.agg(count(lit(1)).as("n"), sum("xu").as("sx"), sum("yu").as("sy"),
          sum(col("xu") * col("yu")).as("sxy"),
          sum(col("xu").cast("decimal(38,0)") * col("xu")).as("sxx"))
        .withColumn("cxy",
          col("n").cast("decimal(38,0)") * col("sxy")
            - col("sx").cast("decimal(38,0)") * col("sy"))
        .withColumn("cxx",
          col("n") * col("sxx").cast("decimal(38,0)")
            - col("sx").cast("decimal(38,0)") * col("sx"))
        .filter(col("cxx") > 0)
        .select(col("n").as("n_users"),
          round(col("cxy").cast("double") / col("cxx").cast("double"), 6)
            .as("shape_k"),
          round(exp(-((col("sy") - col("cxy").cast("double")
              / col("cxx").cast("double") * col("sx")) / col("n"))
            / (col("cxy").cast("double") / col("cxx").cast("double"))
            / 1e6), 4).as("scale_minutes"))
    })
  )

  private[queries] val crCte: String =
    """cr AS (
      |  SELECT o.o_custkey AS c,
      |    SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS x
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1 HAVING SUM(CAST(ROUND(l.l_extendedprice * 100)
      |    AS BIGINT)) > 0)""".stripMargin

  val oracle: Map[String, String] = Map(
    // identical 1e6-snapped log sum
    "q_atkinson" ->
      s"""WITH $crCte,
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(ROUND(LN(x) * 1000000) AS BIGINT)) AS slg,
        |    SUM(x) AS sx
        |  FROM cr)
        |SELECT n AS n_customers,
        |  ROUND(1.0 - exp(CAST(slg AS DOUBLE) / (n * 1e6))
        |    * n / sx, 6) AS atkinson_1
        |FROM ag""".stripMargin,

    // identical rank cuts and long shares
    "q_palma" ->
      s"""WITH $crCte,
        |rk AS (
        |  SELECT x,
        |    CAST(row_number() OVER (ORDER BY x, c) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |    SUM(x) OVER () AS sx
        |  FROM cr)
        |SELECT MAX(n) AS n_customers,
        |  ROUND(CAST(SUM(CASE WHEN rk <= 4 * n // 10 THEN x ELSE 0 END)
        |    AS DOUBLE) / MAX(sx), 6) AS bottom40_share,
        |  ROUND(CAST(SUM(CASE WHEN rk > n - n // 10 THEN x ELSE 0 END)
        |    AS DOUBLE) / MAX(sx), 6) AS top10_share,
        |  ROUND(CAST(SUM(CASE WHEN rk > n - n // 10 THEN x ELSE 0 END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN rk <= 4 * n // 10 THEN x ELSE 0 END), 6)
        |    AS palma
        |FROM rk""".stripMargin,

    // identical HUGEINT deviation sum
    "q_hoover" ->
      s"""WITH $crCte,
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx
        |        FROM cr)
        |SELECT MAX(n) AS n_customers,
        |  ROUND(CAST(SUM(ABS(CAST(n AS HUGEINT) * x - sx)) AS DOUBLE)
        |    / (2.0 * MAX(n) * MAX(sx)), 6) AS hoover
        |FROM cr, tot""".stripMargin,

    // identical per-row snap + exact between chain
    "q_theil_decomp" ->
      s"""WITH $crCte,
        |cg AS (
        |  SELECT cr.c, cr.x, cu.c_nationkey AS g
        |  FROM cr JOIN customer cu ON cr.c = cu.c_custkey),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx
        |        FROM cg),
        |tt AS (
        |  SELECT MAX(tot.n) AS n, MAX(tot.sx) AS sx,
        |    SUM(CAST(ROUND(x / (CAST(tot.sx AS DOUBLE) / tot.n)
        |      * LN(x / (CAST(tot.sx AS DOUBLE) / tot.n)) * 1e9)
        |      AS BIGINT)) AS st
        |  FROM cg, tot),
        |grp AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng, SUM(x) AS sg
        |  FROM cg GROUP BY 1),
        |bt AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    SUM(CAST(sg AS DOUBLE) / tot.sx
        |      * LN((CAST(sg AS DOUBLE) / ng)
        |        / (CAST(tot.sx AS DOUBLE) / tot.n))) AS tb
        |  FROM grp, tot)
        |SELECT tt.n AS n_customers, bt.n_groups,
        |  ROUND(tt.st / 1e9 / tt.n, 6) AS theil_total,
        |  ROUND(bt.tb, 6) AS theil_between,
        |  ROUND(tt.st / 1e9 / tt.n - bt.tb, 6) AS theil_within
        |FROM tt, bt""".stripMargin,

    // identical per-brand 1e9-snapped terms
    "q_tornqvist" ->
      """WITH j AS (
        |  SELECT p.p_brand,
        |    CASE WHEN l.l_shipdate < TIMESTAMP '1996-01-01'
        |      THEN 0 ELSE 1 END AS half,
        |    SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS sc,
        |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qq
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT a.p_brand, a.sc AS s0, a.qq AS q0, c.sc AS s1,
        |    c.qq AS q1
        |  FROM j a JOIN j c ON a.p_brand = c.p_brand
        |  WHERE a.half = 0 AND c.half = 1 AND a.qq > 0 AND c.qq > 0
        |    AND a.sc > 0 AND c.sc > 0),
        |t AS (SELECT SUM(s0) AS t0, SUM(s1) AS t1 FROM b),
        |terms AS (
        |  SELECT CAST(ROUND((CAST(s0 AS DOUBLE) / t0
        |      + CAST(s1 AS DOUBLE) / t1) / 2
        |    * LN(CAST(s1 AS DOUBLE) * q0
        |      / (CAST(s0 AS DOUBLE) * q1)) * 1e9) AS BIGINT) AS term_u
        |  FROM b, t)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
        |  ROUND(exp(SUM(term_u) / 1e9), 6) AS tornqvist_idx
        |FROM terms""".stripMargin,

    // identical µ-snapped Benard regression
    "q_weibull_mrr" ->
      """WITH t AS (
        |  SELECT user_id,
        |    (MIN(CASE WHEN event_type = 'purchase'
        |        THEN epoch_us(ts) END)
        |      - MIN(epoch_us(ts))) // 60000000 AS t_min
        |  FROM events GROUP BY 1
        |  HAVING MIN(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(ts) END) IS NOT NULL
        |    AND (MIN(CASE WHEN event_type = 'purchase'
        |        THEN epoch_us(ts) END)
        |      - MIN(epoch_us(ts))) // 60000000 >= 1),
        |pts AS (
        |  SELECT
        |    CAST(ROUND(LN(CAST(t_min AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS xu,
        |    CAST(ROUND(LN(-LN(1.0
        |      - (CAST(row_number() OVER (ORDER BY t_min, user_id)
        |          AS BIGINT) - 0.3)
        |        / (CAST(COUNT(*) OVER () AS BIGINT) + 0.4))) * 1000000)
        |      AS BIGINT) AS yu
        |  FROM t),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(xu) AS sx,
        |    SUM(yu) AS sy, SUM(xu * yu) AS sxy,
        |    SUM(CAST(xu AS HUGEINT) * xu) AS sxx
        |  FROM pts),
        |cl AS (
        |  SELECT n, sx, sy,
        |    n * sxy - sx * sy AS cxy,
        |    n * sxx - CAST(sx AS HUGEINT) * sx AS cxx
        |  FROM ag)
        |SELECT n AS n_users,
        |  ROUND(CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE), 6)
        |    AS shape_k,
        |  ROUND(exp(-((sy - CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE)
        |      * sx) / n)
        |    / (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE)) / 1e6), 4)
        |    AS scale_minutes
        |FROM cl WHERE cxx > 0""".stripMargin
  )
}
