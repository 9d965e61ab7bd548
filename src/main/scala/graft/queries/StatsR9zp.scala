package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 43 (SURVEY.md §2 B.10b): sequential-basket mining on
  * consecutive customer orders (brand→brand sequence pairs with
  * confidence, per-brand repeat loyalty), a monthly supplier-HHI
  * concentration trend, a KS goodness-of-fit of event inter-arrivals
  * against the fitted exponential, the linear calibration slope of
  * the milli-snapped purchase scorer, and the pooled two-proportion
  * z-test weekend vs weekday.
  *
  * The sequence grain is consecutive ORDER pairs per customer; brand
  * sets are bounded (25), so the pair space is |order pairs|×O(25²)
  * worst-case and brand-rollup-sized after the first groupBy. All
  * tests assemble from exact longs; the KS uses 1e9-snapped
  * exponential CDF values with integer cross-multiplied envelopes.
  */
object StatsR9zp {

  /** Consecutive order pairs (custkey, ok1, ok2) by (orderdate,
    * orderkey) within customer. */
  private def consecOrders(s: SparkSession, d: String): DataFrame =
    // session-memoized (r13 opt): q_seq_pairs + q_brand_loyalty each
    // re-ran the orders window AND re-checkpointed the result per call
    graft.util.SessionMemo.of(s, s"consecOrders:$d") {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("nxt", lead("o_orderkey", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("o_orderkey").as("ok1"), col("nxt").as("ok2"))
    }

  private val consecCte: String =
    """co AS (
      |  SELECT o_orderkey AS ok1, nxt AS ok2 FROM (
      |    SELECT o_orderkey,
      |      lead(o_orderkey) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS nxt
      |    FROM orders)
      |  WHERE nxt IS NOT NULL),
      |ob AS (
      |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)""".stripMargin

  /** Distinct (orderkey, brand) — session-memoized (r13 opt). */
  private def orderBrands(s: SparkSession, d: String): DataFrame =
    graft.util.SessionMemo.of(s, s"orderBrands:$d") {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
    }

  /** Earlier-order brand attachments (ok1, ok2, brand): consecOrders
    * joined to the earlier order's brands — session-memoized (r13
    * opt): q_seq_pairs consumed this twice (pair + base legs) and
    * q_brand_loyalty twice more (cur rollup + repeat probe), each from
    * its own per-call join + checkpoint. Deterministic equi-join of
    * two deterministic memos. */
  private[graft] def curBrands(s: SparkSession, d: String): DataFrame =
    graft.util.SessionMemo.of(s, s"curBrands:$d") {
      consecOrders(s, d)
        .join(orderBrands(s, d).select(col("ok").as("ok1"), col("brand")),
          Seq("ok1"))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Sequential brand pairs across consecutive orders: support =
    // #order-pairs with b1 in the earlier and b2 in the later order;
    // confidence = support / #order-pairs with b1 in the earlier.
    // Top 10 by (support, b1, b2).
    "q_seq_pairs" -> ((s, d) => {
      val cur = curBrands(s, d) // session memo — already materialized
        .withColumnRenamed("brand", "b1")
      val ob = orderBrands(s, d) // session memo — already materialized
      val pairs = cur
        .join(ob.select(col("ok").as("ok2"), col("brand").as("b2")),
          Seq("ok2"))
        .groupBy("b1", "b2").agg(count(lit(1)).as("support"))
      val base = cur
        .groupBy("b1").agg(count(lit(1)).as("n_b1"))
      pairs.join(base, "b1")
        .select(col("b1"), col("b2"), col("support"),
          round(col("support").cast("double") / col("n_b1"), 6)
            .as("confidence"))
        .orderBy(col("support").desc, col("b1").asc, col("b2").asc)
        .limit(10)
    }),

    // Brand loyalty: P(brand in the NEXT order | in the current),
    // min support 20 earlier-order occurrences (stated); top 10 by
    // (loyalty, brand).
    "q_brand_loyalty" -> ((s, d) => {
      val ob = orderBrands(s, d) // session memo — already materialized
      // session memo — already materialized; the per-call checkpoint
      // copy is gone with it
      val cur = curBrands(s, d)
      val rep = cur
        .join(ob.select(col("ok").as("ok2"), col("brand")),
          Seq("ok2", "brand"))
        .groupBy("brand").agg(count(lit(1)).as("n_rep"))
      cur.groupBy("brand").agg(count(lit(1)).as("n_cur"))
        .join(rep, Seq("brand"), "left")
        .filter(col("n_cur") >= 20)
        .select(col("brand"), col("n_cur"),
          coalesce(col("n_rep"), lit(0L)).as("n_rep"),
          round(coalesce(col("n_rep"), lit(0L)).cast("double")
            / col("n_cur"), 6).as("loyalty"))
        .orderBy(col("loyalty").desc, col("brand").asc)
        .limit(10)
    }),

    // Monthly supplier-revenue HHI + its OLS trend: HHI_m =
    // Σ rev_s²/(Σrev)² snapped to 1e9, slope from cleared moments on
    // the month index.
    "q_hhi_trend" -> ((s, d) => {
      val sm = Tables.lineitem(s, d)
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date")
          .as("m"), col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("rev"))
      val hhi = sm.groupBy("m")
        .agg(sum("rev").as("tot"),
          sum(col("rev").cast("decimal(38,0)") * col("rev")).as("sq"))
        .filter(col("tot") > 0)
        .select(col("m"),
          round(col("sq").cast("double")
            / (col("tot").cast("double") * col("tot")) * 1e9)
            .cast("long").as("h_u"))
        // bounded grain: one HHI row per month
        .withColumn("i",
          row_number().over(Window.orderBy("m")).cast("long"))
      hhi.agg(count(lit(1)).as("n"), sum("i").as("sx"),
          sum("h_u").as("sy"), sum(col("i") * col("h_u")).as("sxy"),
          sum(col("i") * col("i")).as("sxx"))
        .withColumn("cxy", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("cxx", col("n") * col("sxx") - col("sx") * col("sx"))
        .filter(col("cxx") > 0)
        .select(col("n").as("n_months"),
          round(col("sy").cast("double") / col("n") / 1e9, 6)
            .as("mean_hhi"),
          round(col("cxy").cast("double") / col("cxx") / 1e9, 9)
            .as("hhi_slope_per_month"))
    }),

    // KS vs the fitted exponential on global event inter-arrival µs
    // gaps: U = 1 − exp(−g·n/Σg) snapped to 1e9, D from integer
    // envelopes i·K − n·U and n·U − (i−1)·K over the sorted U.
    "q_ks_exponential" -> ((s, d) => {
      // event-grain global lag → range-partitioned rank + equi-join
      // on rank−1 (the distributed lag; r10 VERDICT task 4)
      val ev = Tables.events(s, d)
        .select(unix_micros(col("ts")).as("tu"), col("event_id"))
      val r = graft.operators.PrefixSum.rank(ev,
        Seq(col("tu"), col("event_id")), "rn")
      val g = r.join(r.select((col("rn") + 1L).as("rn"),
          col("tu").as("pt")), Seq("rn"))
        .select((col("tu") - col("pt")).as("g"))
        .localCheckpoint(eager = true)
      val tot = g.agg(count(lit(1)).as("n"), sum("g").as("sg"))
      // gap-grain sorted positions → tie-safe block ranks; the KS
      // envelopes only read the value-at-position (tie invariant)
      val u0 = g.crossJoin(broadcast(tot))
        .select(col("n"),
          round((lit(1.0) - exp(-col("g").cast("double") * col("n")
            / col("sg"))) * 1e9).cast("long").as("uu"))
      val u = graft.operators.PrefixSum
        .sortedPositions(u0, col("uu"), "uu", "i")
        .crossJoin(broadcast(tot))
      u.agg(max("n").as("n_gaps"),
          max(col("i") * lit(1000000000L) - col("n") * col("uu"))
            .as("dp_num"),
          max(col("n") * col("uu") - (col("i") - 1) * lit(1000000000L))
            .as("dm_num"))
        .select(col("n_gaps"),
          round(greatest(col("dp_num"), col("dm_num")).cast("double")
            / (col("n_gaps").cast("double") * 1e9), 6).as("ks_d"),
          round(sqrt(col("n_gaps").cast("double"))
            * greatest(col("dp_num"), col("dm_num"))
            / (col("n_gaps").cast("double") * 1e9), 6)
            .as("ks_sqrt_n_d"))
    }),

    // Linear calibration slope of the milli-snapped purchase scorer
    // (the q_brier_decomp fixture): OLS of y on p = pm/1000 from
    // cleared long moments — ideal slope 1.
    "q_calibration_slope" -> ((s, d) => {
      val b = Tables.events(s, d)
        .select(least(round(col("value") * 5).cast("long"), lit(999L))
            .as("pm"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"))
      b.agg(count(lit(1)).as("n"), sum("pm").as("sx"), sum("y").as("sy"),
          sum(col("pm") * col("y")).as("sxy"),
          sum(col("pm").cast("decimal(38,0)") * col("pm")).as("sxx"))
        .withColumn("cxy",
          col("n").cast("decimal(38,0)") * col("sxy")
            - col("sx").cast("decimal(38,0)") * col("sy"))
        .withColumn("cxx",
          col("n") * col("sxx").cast("decimal(38,0)")
            - col("sx").cast("decimal(38,0)") * col("sx"))
        .filter(col("cxx") > 0)
        .withColumn("slope", col("cxy").cast("double")
          / col("cxx").cast("double") * 1000)
        .select(col("n").as("n_events"),
          round(col("slope"), 6).as("calibration_slope"),
          round((col("sy").cast("double")
            - col("cxy").cast("double") / col("cxx").cast("double")
              * col("sx")) / col("n"), 6).as("calibration_intercept"))
    }),

    // Two-proportion z weekend vs weekday purchase rate: pooled
    // variance, exact counts.
    "q_two_proportion" -> ((s, d) => {
      Tables.events(s, d)
        .select(dayofweek(col("ts")).isin(1, 7).as("we"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"))
        .agg(sum(when(col("we"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("we"), col("y")).otherwise(0L)).as("x1"),
          sum(when(!col("we"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("we"), col("y")).otherwise(0L)).as("x2"))
        .filter(col("n1") > 0 && col("n2") > 0)
        .withColumn("p1", col("x1").cast("double") / col("n1"))
        .withColumn("p2", col("x2").cast("double") / col("n2"))
        .withColumn("pp", (col("x1") + col("x2")).cast("double")
          / (col("n1") + col("n2")))
        .filter(col("pp") > 0 && col("pp") < 1)
        .select(col("n1").as("n_weekend"), col("x1").as("k_weekend"),
          col("n2").as("n_weekday"), col("x2").as("k_weekday"),
          round(col("p1") - col("p2"), 6).as("rate_diff"),
          round((col("p1") - col("p2"))
            / sqrt(col("pp") * (lit(1.0) - col("pp"))
              * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))), 6)
            .as("z"))
    })
  )

  val oracle: Map[String, String] = Map(
    // identical consecutive-order brand pairs
    "q_seq_pairs" ->
      (s"WITH $consecCte," +
      """
        |pairs AS (
        |  SELECT a.brand AS b1, b.brand AS b2,
        |    CAST(COUNT(*) AS BIGINT) AS support
        |  FROM co
        |  JOIN ob a ON a.ok = co.ok1
        |  JOIN ob b ON b.ok = co.ok2
        |  GROUP BY 1, 2),
        |base AS (
        |  SELECT a.brand AS b1, CAST(COUNT(*) AS BIGINT) AS n_b1
        |  FROM co JOIN ob a ON a.ok = co.ok1
        |  GROUP BY 1)
        |SELECT p.b1, p.b2, p.support,
        |  ROUND(CAST(p.support AS DOUBLE) / base.n_b1, 6)
        |    AS confidence
        |FROM pairs p JOIN base ON p.b1 = base.b1
        |ORDER BY p.support DESC, p.b1 ASC, p.b2 ASC
        |LIMIT 10""".stripMargin),

    // identical repeat-brand tallies
    "q_brand_loyalty" ->
      (s"WITH $consecCte," +
      """
        |cur AS (
        |  SELECT co.ok2, a.brand
        |  FROM co JOIN ob a ON a.ok = co.ok1),
        |rep AS (
        |  SELECT cur.brand, CAST(COUNT(*) AS BIGINT) AS n_rep
        |  FROM cur JOIN ob b ON b.ok = cur.ok2
        |    AND b.brand = cur.brand
        |  GROUP BY 1),
        |cn AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_cur
        |  FROM cur GROUP BY 1)
        |SELECT cn.brand, cn.n_cur,
        |  COALESCE(rep.n_rep, 0) AS n_rep,
        |  ROUND(CAST(COALESCE(rep.n_rep, 0) AS DOUBLE) / cn.n_cur, 6)
        |    AS loyalty
        |FROM cn LEFT JOIN rep ON cn.brand = rep.brand
        |WHERE cn.n_cur >= 20
        |ORDER BY loyalty DESC, cn.brand ASC
        |LIMIT 10""".stripMargin),

    // identical snapped monthly HHI + cleared trend
    "q_hhi_trend" ->
      """WITH sm AS (
        |  SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE))
        |      AS DATE) AS m,
        |    l_suppkey,
        |    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |hhi AS (
        |  SELECT m,
        |    CAST(ROUND(CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
        |      / (CAST(SUM(rev) AS DOUBLE) * SUM(rev)) * 1e9) AS BIGINT)
        |      AS h_u
        |  FROM sm GROUP BY 1 HAVING SUM(rev) > 0),
        |ix AS (
        |  SELECT h_u,
        |    CAST(row_number() OVER (ORDER BY m) AS BIGINT) AS i
        |  FROM hhi),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(i) AS sx,
        |    SUM(h_u) AS sy, SUM(i * h_u) AS sxy, SUM(i * i) AS sxx
        |  FROM ix)
        |SELECT n AS n_months,
        |  ROUND(CAST(sy AS DOUBLE) / n / 1e9, 6) AS mean_hhi,
        |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (n * sxx - sx * sx) / 1e9, 9) AS hhi_slope_per_month
        |FROM ag WHERE n * sxx - sx * sx > 0""".stripMargin,

    // identical snapped exponential CDF envelopes
    "q_ks_exponential" ->
      """WITH g AS (
        |  SELECT tu - pt AS g
        |  FROM (SELECT epoch_us(ts) AS tu, event_id,
        |          lag(epoch_us(ts)) OVER (ORDER BY epoch_us(ts),
        |            event_id) AS pt
        |        FROM events)
        |  WHERE pt IS NOT NULL),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(g) AS sg
        |        FROM g),
        |u AS (
        |  SELECT tot.n,
        |    CAST(ROUND((1.0 - exp(-CAST(g.g AS DOUBLE) * tot.n
        |      / tot.sg)) * 1e9) AS BIGINT) AS uu
        |  FROM g, tot),
        |ix AS (
        |  SELECT n, uu,
        |    CAST(row_number() OVER (ORDER BY uu) AS BIGINT) AS i
        |  FROM u),
        |ag AS (
        |  SELECT MAX(n) AS n_gaps,
        |    MAX(i * 1000000000 - n * uu) AS dp_num,
        |    MAX(n * uu - (i - 1) * 1000000000) AS dm_num
        |  FROM ix)
        |SELECT n_gaps,
        |  ROUND(CAST(GREATEST(dp_num, dm_num) AS DOUBLE)
        |    / (CAST(n_gaps AS DOUBLE) * 1e9), 6) AS ks_d,
        |  ROUND(sqrt(CAST(n_gaps AS DOUBLE))
        |    * GREATEST(dp_num, dm_num)
        |    / (CAST(n_gaps AS DOUBLE) * 1e9), 6) AS ks_sqrt_n_d
        |FROM ag""".stripMargin,

    // identical cleared calibration moments
    "q_calibration_slope" ->
      """WITH b AS (
        |  SELECT LEAST(CAST(ROUND(value * 5) AS BIGINT), 999) AS pm,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(pm) AS sx,
        |    SUM(y) AS sy, SUM(pm * y) AS sxy,
        |    SUM(CAST(pm AS HUGEINT) * pm) AS sxx
        |  FROM b),
        |cl AS (
        |  SELECT n, sx, sy,
        |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |      AS cxy,
        |    n * sxx - CAST(sx AS HUGEINT) * sx AS cxx
        |  FROM ag)
        |SELECT n AS n_events,
        |  ROUND(CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE) * 1000, 6)
        |    AS calibration_slope,
        |  ROUND((CAST(sy AS DOUBLE)
        |    - CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE) * sx) / n, 6)
        |    AS calibration_intercept
        |FROM cl WHERE cxx > 0""".stripMargin,

    // identical pooled-variance z
    "q_two_proportion" ->
      """WITH ag AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0
        |      END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6)
        |      AND event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x1,
        |    CAST(SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6) THEN 1
        |      ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6)
        |      AND event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x2
        |  FROM events),
        |st AS (
        |  SELECT n1, x1, n2, x2,
        |    CAST(x1 AS DOUBLE) / n1 AS p1,
        |    CAST(x2 AS DOUBLE) / n2 AS p2,
        |    CAST(x1 + x2 AS DOUBLE) / (n1 + n2) AS pp
        |  FROM ag WHERE n1 > 0 AND n2 > 0)
        |SELECT n1 AS n_weekend, x1 AS k_weekend,
        |  n2 AS n_weekday, x2 AS k_weekday,
        |  ROUND(p1 - p2, 6) AS rate_diff,
        |  ROUND((p1 - p2) / sqrt(pp * (1.0 - pp)
        |    * (1.0 / n1 + 1.0 / n2)), 6) AS z
        |FROM st WHERE pp > 0 AND pp < 1""".stripMargin
  )
}
