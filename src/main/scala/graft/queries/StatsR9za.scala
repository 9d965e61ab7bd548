package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 27 (SURVEY.md §2 B.10b): commerce planning and a
  * directed supplier-handoff graph — Paasche + Fisher price indexes
  * (the q_laspeyres companions, identical per-brand unit-value
  * snapping), the newsvendor critical-fractile stock level (type-1
  * order statistic at CR = 0.8, stated), weighted Slope One brand
  * recommendations (all-integer deviation matrix, one final
  * division), Katz centrality as three exact vector-matrix hops
  * (α = 0.1 clears to (100·c1 + 10·c2 + c3)/1000), digraph
  * reciprocity, and a Bass-diffusion quadratic fit of weekly adopter
  * counts on snapped cumulative adoption (Cramer 3×3 over exact
  * HUGEINT/decimal moment sums; the implied M/p/q emitted only where
  * the quadratic inverts, NULL otherwise — identically both engines).
  * The handoff graph samples l_orderkey % 10 = 0 (stated): edge
  * density falls as the supplier universe grows, and each Katz hop is
  * one |E|-row join — never a path enumeration.
  */
object StatsR9za {

  /** Distinct supplier→supplier handoff edges: consecutive lines of
    * each sampled order (l_orderkey % 10 = 0), self-loops dropped.
    * Reused by katz (4 refs) and reciprocity (2 refs) — checkpointed.
    * ORDER MUST BE TOTAL (r11, found by the sf0.1 full compare):
    * (l_orderkey, l_linenumber) has duplicate pairs at every SF, so a
    * bare l_linenumber lead order let each engine break ties its own
    * way and the whole handoff-graph family silently diverged at
    * sf0.1; (l_linenumber, l_suppkey, l_partkey) is unique per order.
    */
  // session-memoized (r13 opt): 11 graph keys re-derived this edge
  // list (lineitem scan + per-order window + distinct) per call
  private[graft] def handoff(s: SparkSession, d: String): DataFrame =
    graft.util.SessionMemo.of(s, s"handoff:$d") {
      Tables.lineitem(s, d)
        .filter(expr("l_orderkey % 10 = 0"))
        .select(col("l_suppkey").as("src"),
          lead("l_suppkey", 1).over(Window.partitionBy("l_orderkey")
            .orderBy("l_linenumber", "l_suppkey", "l_partkey")).as("dst"))
        .filter(col("dst").isNotNull && col("dst") =!= col("src"))
        .distinct()
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Paasche index Σs1/Σround(s0·q1/q0) and Fisher √(L·P) over the
    // q_laspeyres brand halves (base < 1996): per-brand unit-value
    // terms snapped once to cents, exactly the laspeyres convention.
    "q_paasche_fisher" -> ((s, d) => {
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
      b0.join(b1, "p_brand")
        .filter(col("q0") > 0 && col("q1") > 0)
        .agg(count(lit(1)).as("n_brands"),
          sum("s0").as("den_l"),
          sum(round(col("s1").cast("double") * col("q0") / col("q1"))
            .cast("long")).as("num_l"),
          sum("s1").as("num_p"),
          sum(round(col("s0").cast("double") * col("q1") / col("q0"))
            .cast("long")).as("den_p"))
        .filter(col("den_l") > 0 && col("den_p") > 0)
        .select(col("n_brands"),
          round(col("num_p").cast("double") / col("den_p"), 6)
            .as("paasche_idx"),
          round(sqrt((col("num_l").cast("double") / col("den_l"))
            * (col("num_p").cast("double") / col("den_p"))), 6)
            .as("fisher_idx"))
    }),

    // Newsvendor stock level per brand: q* = the ceil(0.8·n)-th order
    // statistic of daily brand demand (type-1 quantile over days WITH
    // sales, ties broken by day — stated), plus the realized service
    // level P(demand ≤ q*).
    "q_newsvendor" -> ((s, d) => {
      val dd = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_shipdate").cast("date").as("d"))
        .agg(sum(col("l_quantity").cast("long")).as("dem"))
        .localCheckpoint(eager = true) // rank leg + service-level leg
      val wb = Window.partitionBy("p_brand")
      val q = dd
        .withColumn("rn", row_number().over(wb.orderBy("dem", "d")))
        .withColumn("n", count(lit(1)).over(wb))
        .groupBy("p_brand")
        .agg(max("n").as("n_days"),
          max(when(col("rn") === ceil(lit(0.8) * col("n")).cast("long"),
            col("dem"))).as("q_star"))
      q.join(dd.select(col("p_brand").as("pb"), col("dem")),
          col("p_brand") === col("pb"))
        .groupBy("p_brand")
        .agg(max("n_days").as("n_days"), max("q_star").as("q_star"),
          sum(when(col("dem") <= col("q_star"), 1L).otherwise(0L))
            .as("cnt"))
        .select(col("p_brand"), col("n_days"), col("q_star"),
          round(col("cnt").cast("double") / col("n_days"), 6)
            .as("service_level"))
        .orderBy("p_brand")
    }),

    // Weighted Slope One brand recommendations for the c % 97 = 0
    // customer sample (stated): rating = milli-snapped mean line
    // quantity per (customer, brand); deviation matrix and prediction
    // numerator Σ(r·n + Σdiff) stay exact longs, ONE final division.
    "q_slope_one" -> ((s, d) => {
      val r = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("o_custkey").as("c"), col("p_brand").as("b"))
        .agg(expr("sum(cast(l_quantity as bigint) * 1000) div count(1)")
          .as("r"))
        .localCheckpoint(eager = true) // dev + target + pred legs
      val dev = r.select(col("c"), col("b").as("b1"), col("r").as("r1"))
        .join(r.select(col("c").as("c2"), col("b").as("b2"),
          col("r").as("r2")),
          col("c") === col("c2") && col("b1") =!= col("b2"))
        .groupBy("b1", "b2")
        .agg(count(lit(1)).as("n"), sum(col("r1") - col("r2")).as("sdiff"))
      val target = r.filter(expr("c % 97 = 0")).select("c").distinct()
        .crossJoin(r.select("b").distinct())
        .join(r.select(col("c").as("rc"), col("b").as("rb")),
          col("c") === col("rc") && col("b") === col("rb"), "left_anti")
      target
        .join(r.select(col("c").as("cc"), col("b").as("rb"),
          col("r").as("rr")), col("c") === col("cc"))
        .join(dev, col("b1") === col("b") && col("b2") === col("rb"))
        .groupBy(col("c"), col("b"))
        .agg(sum(col("rr") * col("n") + col("sdiff")).as("num"),
          sum("n").as("den"))
        .filter(col("den") > 0)
        .select(col("c").as("custkey"), col("b").as("brand"),
          round(col("num").cast("double") / col("den")).cast("long")
            .as("pred_milli"),
          col("den").as("support"))
        .orderBy("custkey", "brand")
    }),

    // Katz centrality on the handoff digraph, α = 0.1, 3 hops:
    // c_k(v) = (1ᵀAᵏ)(v) by repeated |E|-row vector-matrix joins
    // (exact longs), katz = (100·c1 + 10·c2 + c3)/1000 exactly.
    "q_katz_centrality" -> ((s, d) => {
      val e = handoff(s, d)
      val r1 = e.groupBy(col("dst").as("v"))
        .agg(count(lit(1)).as("c1"))
      val r2 = r1.join(e, col("src") === col("v"))
        .groupBy(col("dst").as("v2")).agg(sum("c1").as("c2"))
      val r3 = r2.join(e, col("src") === col("v2"))
        .groupBy(col("dst").as("v3")).agg(sum("c2").as("c3"))
      val allv = e.select(col("src").as("v")).distinct()
        .union(e.select(col("dst"))).distinct()
      allv
        .join(r1.withColumnRenamed("v", "w1"), col("v") === col("w1"),
          "left")
        .join(r2, col("v") === col("v2"), "left")
        .join(r3, col("v") === col("v3"), "left")
        .select(col("v").as("suppkey"),
          coalesce(col("c1"), lit(0L)).as("paths1"),
          coalesce(col("c2"), lit(0L)).as("paths2"),
          coalesce(col("c3"), lit(0L)).as("paths3"),
          round((lit(100L) * coalesce(col("c1"), lit(0L))
            + lit(10L) * coalesce(col("c2"), lit(0L))
            + coalesce(col("c3"), lit(0L))) / lit(1000.0), 3)
            .as("katz"))
        .orderBy("suppkey")
    }),

    // Digraph reciprocity of the handoff graph: share of distinct
    // directed edges whose reverse also occurs, and the mutual-dyad
    // count (= reciprocal edges / 2).
    "q_reciprocity" -> ((s, d) => {
      val e = handoff(s, d)
      val recip = e.join(e.select(col("src").as("rs"),
          col("dst").as("rd")),
        col("src") === col("rd") && col("dst") === col("rs"),
        "left_semi")
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(recip.agg(count(lit(1)).as("recip")))
        .filter(col("n_edges") > 0)
        .select(col("n_edges"), expr("recip div 2").as("mutual_dyads"),
          round(col("recip").cast("double") / col("n_edges"), 6)
            .as("reciprocity"))
    }),

    // Bass-diffusion quadratic y = a + b·x + c·x² of weekly new
    // customers on snapped cumulative adoption x = N_prev div 10
    // (adoption = first order week): moment sums Σxᵏ, Σxᵏy as
    // decimal(38,0) exact carriers, Cramer 3×3 assembled in doubles
    // spelled identically in the oracle; M/q/p from the c<0 root,
    // NULL when the quadratic doesn't invert (uniform adoption).
    "q_bass_diffusion" -> ((s, d) => {
      val wk = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(date_trunc("week", min(col("o_orderdate")).cast("date"))
          .cast("date").as("w"))
        .groupBy("w").agg(count(lit(1)).as("y"))
      val cum = wk
        .withColumn("x", expr(
          "coalesce(sum(y) over (order by w rows between unbounded " +
            "preceding and 1 preceding), 0) div 10"))
      val dec = (c: org.apache.spark.sql.Column) =>
        c.cast("decimal(38,0)")
      val m = cum.agg(count(lit(1)).as("n"),
          sum(dec(col("x"))).as("sx"),
          sum(dec(col("x")) * col("x")).as("sx2"),
          sum(dec(col("x")) * col("x") * col("x")).as("sx3"),
          sum(dec(col("x")) * col("x") * col("x") * col("x")).as("sx4"),
          sum(dec(col("y"))).as("sy"),
          sum(dec(col("x")) * col("y")).as("sxy"),
          sum(dec(col("x")) * col("x") * col("y")).as("sx2y"))
        .select(col("n"), col("n").cast("double").as("dn"),
          col("sx").cast("double").as("dx"),
          col("sx2").cast("double").as("dx2"),
          col("sx3").cast("double").as("dx3"),
          col("sx4").cast("double").as("dx4"),
          col("sy").cast("double").as("dy"),
          col("sxy").cast("double").as("dxy"),
          col("sx2y").cast("double").as("dx2y"))
      val sdf = m.select(col("n"),
        (col("dn") * (col("dx2") * col("dx4") - col("dx3") * col("dx3"))
          - col("dx") * (col("dx") * col("dx4") - col("dx2") * col("dx3"))
          + col("dx2") * (col("dx") * col("dx3") - col("dx2") * col("dx2")))
          .as("det"),
        (col("dy") * (col("dx2") * col("dx4") - col("dx3") * col("dx3"))
          - col("dx") * (col("dxy") * col("dx4") - col("dx2y") * col("dx3"))
          + col("dx2") * (col("dxy") * col("dx3") - col("dx2y") * col("dx2")))
          .as("deta"),
        (col("dn") * (col("dxy") * col("dx4") - col("dx2y") * col("dx3"))
          - col("dy") * (col("dx") * col("dx4") - col("dx2") * col("dx3"))
          + col("dx2") * (col("dx") * col("dx2y") - col("dxy") * col("dx2")))
          .as("detb"),
        (col("dn") * (col("dx2") * col("dx2y") - col("dx3") * col("dxy"))
          - col("dx") * (col("dx") * col("dx2y") - col("dx3") * col("dy"))
          + col("dy") * (col("dx") * col("dx3") - col("dx2") * col("dx2")))
          .as("detc"))
      val coef = sdf.filter(col("det") =!= 0)
        .select(col("n"), (col("deta") / col("det")).as("a"),
          (col("detb") / col("det")).as("b"),
          (col("detc") / col("det")).as("c"))
      val disc = col("b") * col("b") - lit(4.0) * col("a") * col("c")
      val mroot = (negate(col("b")) - sqrt(disc)) / (lit(2.0) * col("c"))
      coef.select(col("n").as("n_weeks"), round(col("a"), 6).as("a"),
        round(col("b"), 6).as("b"), round(col("c"), 6).as("c"),
        when(col("c") < 0 && disc > 0, round(mroot, 3)).as("m_hat"),
        when(col("c") < 0 && disc > 0, round(negate(col("c")) * mroot, 6))
          .as("q_hat"),
        when(col("c") < 0 && disc > 0, round(col("a") / mroot, 6))
          .as("p_hat"))
    })
  )

  private[queries] val edgeCte =
    """e AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT l_suppkey AS src,
      |      LEAD(l_suppkey) OVER (PARTITION BY l_orderkey
      |        ORDER BY l_linenumber, l_suppkey, l_partkey) AS dst
      |    FROM lineitem WHERE l_orderkey % 10 = 0)
      |  WHERE dst IS NOT NULL AND dst <> src)""".stripMargin

  val oracle: Map[String, String] = Map(
    // identical per-brand snapping; one sqrt chain for Fisher
    "q_paasche_fisher" ->
      """WITH j AS (
        |  SELECT p.p_brand,
        |    CASE WHEN l.l_shipdate < TIMESTAMP '1996-01-01'
        |      THEN 0 ELSE 1 END AS half,
        |    CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS sc,
        |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qq
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT a.p_brand, a.sc AS s0, a.qq AS q0, c.sc AS s1,
        |    c.qq AS q1
        |  FROM j a JOIN j c ON a.p_brand = c.p_brand
        |  WHERE a.half = 0 AND c.half = 1 AND a.qq > 0 AND c.qq > 0),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
        |    SUM(s0) AS den_l,
        |    SUM(CAST(ROUND(CAST(s1 AS DOUBLE) * q0 / q1) AS BIGINT))
        |      AS num_l,
        |    SUM(s1) AS num_p,
        |    SUM(CAST(ROUND(CAST(s0 AS DOUBLE) * q1 / q0) AS BIGINT))
        |      AS den_p
        |  FROM b)
        |SELECT n_brands,
        |  ROUND(CAST(num_p AS DOUBLE) / den_p, 6) AS paasche_idx,
        |  ROUND(sqrt((CAST(num_l AS DOUBLE) / den_l)
        |    * (CAST(num_p AS DOUBLE) / den_p)), 6) AS fisher_idx
        |FROM t WHERE den_l > 0 AND den_p > 0""".stripMargin,

    // identical type-1 order statistic and service rollup
    "q_newsvendor" ->
      """WITH dd AS (
        |  SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS d,
        |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS dem
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT p_brand, dem,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY dem, d)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY p_brand) AS n
        |  FROM dd),
        |q AS (
        |  SELECT p_brand, MAX(n) AS n_days,
        |    MAX(CASE WHEN rn = CAST(ceil(0.8 * n) AS BIGINT)
        |      THEN dem END) AS q_star
        |  FROM rk GROUP BY 1)
        |SELECT q.p_brand AS p_brand, MAX(n_days) AS n_days,
        |  MAX(q_star) AS q_star,
        |  ROUND(CAST(SUM(CASE WHEN dd.dem <= q.q_star THEN 1 ELSE 0
        |    END) AS DOUBLE) / MAX(n_days), 6) AS service_level
        |FROM q JOIN dd ON dd.p_brand = q.p_brand
        |GROUP BY q.p_brand
        |ORDER BY q.p_brand""".stripMargin,

    // identical integer deviation matrix and prediction rollup
    "q_slope_one" ->
      """WITH r AS (
        |  SELECT o.o_custkey AS c, p.p_brand AS b,
        |    CAST(SUM(CAST(l.l_quantity AS BIGINT) * 1000)
        |      // COUNT(*) AS BIGINT) AS r
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |dev AS (
        |  SELECT a.b AS b1, c.b AS b2, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a.r - c.r) AS BIGINT) AS sdiff
        |  FROM r a JOIN r c ON a.c = c.c AND a.b <> c.b
        |  GROUP BY 1, 2),
        |target AS (
        |  SELECT rc.c, br.b
        |  FROM (SELECT DISTINCT c FROM r WHERE c % 97 = 0) rc
        |  CROSS JOIN (SELECT DISTINCT b FROM r) br
        |  WHERE NOT EXISTS (SELECT 1 FROM r
        |    WHERE r.c = rc.c AND r.b = br.b)),
        |pred AS (
        |  SELECT t.c, t.b,
        |    CAST(SUM(rr.r * d.n + d.sdiff) AS BIGINT) AS num,
        |    CAST(SUM(d.n) AS BIGINT) AS den
        |  FROM target t
        |  JOIN r rr ON rr.c = t.c
        |  JOIN dev d ON d.b1 = t.b AND d.b2 = rr.b
        |  GROUP BY 1, 2)
        |SELECT c AS custkey, b AS brand,
        |  CAST(ROUND(CAST(num AS DOUBLE) / den) AS BIGINT)
        |    AS pred_milli,
        |  den AS support
        |FROM pred WHERE den > 0 ORDER BY custkey, brand""".stripMargin,

    // identical three |E|-row vector hops
    "q_katz_centrality" -> (s"WITH $edgeCte," +
      """
        |r1 AS (
        |  SELECT dst AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1),
        |r2 AS (
        |  SELECT e.dst AS v, CAST(SUM(r1.c) AS BIGINT) AS c
        |  FROM r1 JOIN e ON e.src = r1.v GROUP BY 1),
        |r3 AS (
        |  SELECT e.dst AS v, CAST(SUM(r2.c) AS BIGINT) AS c
        |  FROM r2 JOIN e ON e.src = r2.v GROUP BY 1),
        |allv AS (SELECT DISTINCT src AS v FROM e
        |  UNION SELECT DISTINCT dst FROM e)
        |SELECT allv.v AS suppkey,
        |  COALESCE(r1.c, 0) AS paths1, COALESCE(r2.c, 0) AS paths2,
        |  COALESCE(r3.c, 0) AS paths3,
        |  ROUND((100 * COALESCE(r1.c, 0) + 10 * COALESCE(r2.c, 0)
        |    + COALESCE(r3.c, 0)) / 1000.0, 3) AS katz
        |FROM allv
        |LEFT JOIN r1 ON r1.v = allv.v
        |LEFT JOIN r2 ON r2.v = allv.v
        |LEFT JOIN r3 ON r3.v = allv.v
        |ORDER BY suppkey""".stripMargin),

    // identical reverse-edge semi probe
    "q_reciprocity" -> (s"WITH $edgeCte," +
      """
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
        |    CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM e r
        |      WHERE r.src = e.dst AND r.dst = e.src) THEN 1 ELSE 0
        |      END) AS BIGINT) AS recip
        |  FROM e)
        |SELECT n_edges, recip // 2 AS mutual_dyads,
        |  ROUND(CAST(recip AS DOUBLE) / n_edges, 6) AS reciprocity
        |FROM t WHERE n_edges > 0""".stripMargin),

    // identical HUGEINT moments and double Cramer chains
    "q_bass_diffusion" ->
      """WITH fw AS (
        |  SELECT o_custkey,
        |    CAST(date_trunc('week', CAST(MIN(o_orderdate) AS DATE))
        |      AS DATE) AS w
        |  FROM orders GROUP BY 1),
        |wk AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS y FROM fw GROUP BY 1),
        |cum AS (
        |  SELECT w, y,
        |    CAST(COALESCE(SUM(y) OVER (ORDER BY w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // 10 AS BIGINT) AS x
        |  FROM wk),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sx2,
        |    SUM(CAST(x AS HUGEINT) * x * x) AS sx3,
        |    SUM(CAST(x AS HUGEINT) * x * x * x) AS sx4,
        |    SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x * y) AS sx2y
        |  FROM cum),
        |d AS (
        |  SELECT n, CAST(n AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dx,
        |    CAST(sx2 AS DOUBLE) AS dx2, CAST(sx3 AS DOUBLE) AS dx3,
        |    CAST(sx4 AS DOUBLE) AS dx4, CAST(sy AS DOUBLE) AS dy,
        |    CAST(sxy AS DOUBLE) AS dxy, CAST(sx2y AS DOUBLE) AS dx2y
        |  FROM m),
        |s AS (
        |  SELECT n,
        |    dn * (dx2 * dx4 - dx3 * dx3)
        |      - dx * (dx * dx4 - dx2 * dx3)
        |      + dx2 * (dx * dx3 - dx2 * dx2) AS det,
        |    dy * (dx2 * dx4 - dx3 * dx3)
        |      - dx * (dxy * dx4 - dx2y * dx3)
        |      + dx2 * (dxy * dx3 - dx2y * dx2) AS deta,
        |    dn * (dxy * dx4 - dx2y * dx3)
        |      - dy * (dx * dx4 - dx2 * dx3)
        |      + dx2 * (dx * dx2y - dxy * dx2) AS detb,
        |    dn * (dx2 * dx2y - dx3 * dxy)
        |      - dx * (dx * dx2y - dx3 * dy)
        |      + dy * (dx * dx3 - dx2 * dx2) AS detc
        |  FROM d),
        |coef AS (
        |  SELECT n, deta / det AS a, detb / det AS b, detc / det AS c
        |  FROM s WHERE det <> 0)
        |SELECT n AS n_weeks, ROUND(a, 6) AS a, ROUND(b, 6) AS b,
        |  ROUND(c, 6) AS c,
        |  CASE WHEN c < 0 AND b * b - 4 * a * c > 0
        |    THEN ROUND((-b - sqrt(b * b - 4 * a * c)) / (2 * c), 3)
        |    END AS m_hat,
        |  CASE WHEN c < 0 AND b * b - 4 * a * c > 0
        |    THEN ROUND(-c * ((-b - sqrt(b * b - 4 * a * c)) / (2 * c)),
        |      6) END AS q_hat,
        |  CASE WHEN c < 0 AND b * b - 4 * a * c > 0
        |    THEN ROUND(a / ((-b - sqrt(b * b - 4 * a * c)) / (2 * c)),
        |      6) END AS p_hat
        |FROM coef""".stripMargin
  )
}
