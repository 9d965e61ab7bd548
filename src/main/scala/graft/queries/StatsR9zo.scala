package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 42 (SURVEY.md §2 B.10b): survival-analysis depth and
  * order-ops keys — restricted mean survival time to τ=14 days,
  * competing-risks cumulative incidence (purchase vs error), the
  * mean cumulative function for recurrent purchases, backlog aging
  * at a stated snapshot date, the perfect-order rate per priority,
  * and the person-time incidence-rate ratio between the stated
  * user_id-parity groups.
  *
  * Survival fixture: per user, day offsets from the FIRST event;
  * censoring at the user's last event (stated — the q_survival_km
  * signup fixture uses the horizon instead). KM products ride the
  * cumulative-ln window (deterministic evaluation order); every
  * cross-step sum snaps per step to the 1e6/1e9 grid first.
  */
object StatsR9zo {

  /** Per-user (t_days, is_event) for first-purchase survival. */
  private def firstPurchase(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t0"),
        max(unix_micros(col("ts"))).as("tl"),
        min(when(col("event_type") === "purchase",
          unix_micros(col("ts")))).as("tp"))
      .select(
        when(col("tp").isNotNull, expr("(tp - t0) div 86400000000"))
          .otherwise(expr("(tl - t0) div 86400000000")).as("t"),
        col("tp").isNotNull.as("ev"))

  private val fpCte: String =
    """pu AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t0,
      |    MAX(epoch_us(ts)) AS tl,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
      |      END) AS tp
      |  FROM events GROUP BY 1),
      |fp AS (
      |  SELECT CASE WHEN tp IS NOT NULL
      |      THEN (tp - t0) // 86400000000
      |      ELSE (tl - t0) // 86400000000 END AS t,
      |    tp IS NOT NULL AS ev
      |  FROM pu)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // RMST to τ=14 (stated): KM steps on the day grid, per-interval
    // contribution S(prev event)·Δt snapped to 1e6, plus the
    // S(last)·(τ−last) tail; all step logs via the cumulative window.
    "q_rmst" -> ((s, d) => {
      val grid = firstPurchase(s, d)
        .groupBy("t")
        .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("dd"),
          count(lit(1)).as("all_t"))
        .localCheckpoint(eager = true)
      val tot = grid.agg(sum("all_t").as("n_total"),
        sum("dd").as("n_events"))
      // bounded grain: one row per lifetime-day tick (<= day span)
      val wP = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wI = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
      val km = grid.crossJoin(broadcast(tot))
        .withColumn("y", col("n_total")
          - coalesce(sum("all_t").over(wP), lit(0L)))
        .withColumn("lnf", log(greatest(
          lit(1.0) - col("dd") / col("y"), lit(1e-300))))
        .withColumn("s_prev",
          exp(coalesce(sum("lnf").over(wP), lit(0.0))))
        .withColumn("s_incl", exp(sum("lnf").over(wI)))
      val ev = km.filter(col("dd") > 0 && col("t") <= 14)
        .withColumn("pe",
          // bounded grain: one row per lifetime-day tick (<= day span)
          coalesce(lag("t", 1).over(Window.orderBy("t")), lit(0L)))
        .withColumn("term_u",
          round(col("s_prev") * (col("t") - col("pe")) * 1e6)
            .cast("long"))
        .localCheckpoint(eager = true)
      val steps = ev.agg(coalesce(sum("term_u"), lit(0L)).as("su"),
        max(struct(col("t"), col("s_incl"))).as("lastev"))
      steps.crossJoin(broadcast(tot))
        .select(col("n_total").as("n_users"), col("n_events"),
          round((col("su")
            + coalesce(round(col("lastev.s_incl")
                * (lit(14L) - col("lastev.t")) * 1e6).cast("long"),
              lit(14000000L))) / 1e6, 6).as("rmst_14d"))
    }),

    // Competing risks purchase(1) vs error(2), first of either per
    // user, censored at the last event (stated): CIF_k(14) =
    // Σ S_any(t−)·d_k/Y, each step snapped to 1e9.
    "q_cuminc_competing" -> ((s, d) => {
      val pu = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("tl"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("tp"),
          min(when(col("event_type") === "error",
            unix_micros(col("ts")))).as("te"))
        .select(
          when(col("tp").isNotNull && (col("te").isNull
            || col("tp") <= col("te")),
            expr("(tp - t0) div 86400000000"))
            .when(col("te").isNotNull,
              expr("(te - t0) div 86400000000"))
            .otherwise(expr("(tl - t0) div 86400000000")).as("t"),
          when(col("tp").isNotNull && (col("te").isNull
            || col("tp") <= col("te")), 1L)
            .when(col("te").isNotNull, 2L).otherwise(0L).as("cause"))
      val grid = pu.groupBy("t")
        .agg(sum(when(col("cause") === 1, 1L).otherwise(0L)).as("d1"),
          sum(when(col("cause") === 2, 1L).otherwise(0L)).as("d2"),
          count(lit(1)).as("all_t"))
        .localCheckpoint(eager = true)
      val tot = grid.agg(sum("all_t").as("n_total"),
        sum("d1").as("e1"), sum("d2").as("e2"))
      // bounded grain: one row per lifetime-day tick (<= day span)
      val wP = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      grid.crossJoin(broadcast(tot))
        .withColumn("y", col("n_total")
          - coalesce(sum("all_t").over(wP), lit(0L)))
        .withColumn("lnf", log(greatest(lit(1.0)
          - (col("d1") + col("d2")) / col("y"), lit(1e-300))))
        .withColumn("s_prev",
          exp(coalesce(sum("lnf").over(wP), lit(0.0))))
        .filter(col("t") <= 14)
        .agg(max("n_total").as("n_users"), max("e1").as("n_purchase"),
          max("e2").as("n_error"),
          sum(round(col("s_prev") * col("d1") / col("y") * 1e9)
            .cast("long")).as("c1u"),
          sum(round(col("s_prev") * col("d2") / col("y") * 1e9)
            .cast("long")).as("c2u"))
        .select(col("n_users"), col("n_purchase"), col("n_error"),
          round(col("c1u") / 1e9, 6).as("cif_purchase_14d"),
          round(col("c2u") / 1e9, 6).as("cif_error_14d"))
    }),

    // Mean cumulative function of recurrent purchases at offsets
    // {7, 14, 21}: d_s over all purchase offsets, Y_s = users with
    // follow-up ≥ s; per-step d/Y snapped to 1e9, exact cumulative.
    "q_mcf_recurrent" -> ((s, d) => {
      import s.implicits._
      val f = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("tl"))
        .select(col("user_id"), col("t0"),
          expr("(tl - t0) div 86400000000").as("fu"))
        .localCheckpoint(eager = true)
      val offs = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tp"))
        .join(f, "user_id")
        .select(expr("(tp - t0) div 86400000000").as("s0"))
        .groupBy("s0").agg(count(lit(1)).as("ds"))
      val yGrid = f.groupBy("fu").agg(count(lit(1)).as("cf"))
      val steps = offs.join(broadcast(yGrid),
          col("fu") >= col("s0"))
        .groupBy("s0", "ds").agg(sum("cf").as("ys"))
        .withColumn("inc_u",
          round(col("ds").cast("double") / col("ys") * 1e9)
            .cast("long"))
        .localCheckpoint(eager = true)
      val taus = Seq(7L, 14L, 21L).toDF("tau")
      taus.join(steps, col("s0") <= col("tau"), "left")
        .groupBy("tau")
        .agg(coalesce(sum("ds"), lit(0L)).as("n_purchases"),
          coalesce(sum("inc_u"), lit(0L)).as("mu"))
        .select(col("tau").as("t_days"), col("n_purchases"),
          round(col("mu") / 1e9, 6).as("mcf"))
        .orderBy("t_days")
    }),

    // Backlog aging at the 1997-01-01 snapshot (stated): orders
    // placed on/before and not fully shipped by then, aged into
    // 0-30/31-90/91-180/180+ day buckets with revenue shares.
    "q_backlog_aging" -> ((s, d) => {
      val snap = lit("1997-01-01").cast("timestamp_ntz")
      val open = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("maxship"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") <= snap && col("maxship") > snap)
        .withColumn("age", datediff(snap.cast("date"),
          col("o_orderdate").cast("date")).cast("long"))
        .withColumn("bucket",
          when(col("age") <= 30, "000-030")
            .when(col("age") <= 90, "031-090")
            .when(col("age") <= 180, "091-180")
            .otherwise("180+"))
        .withColumn("v", round(col("o_totalprice") * 100).cast("long"))
        .localCheckpoint(eager = true)
      val tot = open.agg(sum("v").as("tv"))
      open.groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"), sum("v").as("bv"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_orders"),
          round(col("bv").cast("double") / col("tv"), 6)
            .as("value_share"))
        .orderBy("bucket")
    }),

    // Perfect-order rate per priority: every line shipped within 30
    // days of the order date AND no line returned (stated proxy).
    "q_perfect_order" -> ((s, d) => {
      val per = Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(max(datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date"))).as("max_lag"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returned"))
        .withColumn("perfect",
          col("max_lag") <= 30 && col("n_returned") === 0)
      per.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("perfect"), 1L).otherwise(0L)).as("n_perfect"))
        .select(col("o_orderpriority"), col("n_orders"),
          col("n_perfect"),
          round(col("n_perfect").cast("double") / col("n_orders"), 6)
            .as("perfect_rate"))
        .orderBy("o_orderpriority")
    }),

    // Incidence-rate ratio between user_id-parity groups (stated):
    // events = purchases, person-time = follow-up days; IRR with the
    // log-normal 1.96 CI, all counts exact.
    "q_incidence_rate_ratio" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("tl"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .select((col("user_id") % 2).as("g"),
          expr("(tl - t0) div 86400000000").as("fu"), col("np"))
      per.groupBy("g")
        .agg(sum("np").as("e"), sum("fu").as("pt"))
        .agg(max(when(col("g") === 1, col("e"))).as("e1"),
          max(when(col("g") === 1, col("pt"))).as("pt1"),
          max(when(col("g") === 0, col("e"))).as("e0"),
          max(when(col("g") === 0, col("pt"))).as("pt0"))
        .filter(col("e1") > 0 && col("e0") > 0
          && col("pt1") > 0 && col("pt0") > 0)
        .withColumn("irr", (col("e1").cast("double") / col("pt1"))
          / (col("e0").cast("double") / col("pt0")))
        .withColumn("sel", sqrt(lit(1.0) / col("e1")
          + lit(1.0) / col("e0")))
        .select(col("e1").as("events_g1"), col("pt1").as("days_g1"),
          col("e0").as("events_g0"), col("pt0").as("days_g0"),
          round(col("irr"), 6).as("irr"),
          round(exp(log(col("irr")) - lit(1.96) * col("sel")), 6)
            .as("ci_lo"),
          round(exp(log(col("irr")) + lit(1.96) * col("sel")), 6)
            .as("ci_hi"))
    })
  )

  val oracle: Map[String, String] = Map(
    // identical snapped KM interval terms
    "q_rmst" ->
      (s"WITH $fpCte," +
      """
        |grid AS (
        |  SELECT t,
        |    CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS dd,
        |    CAST(COUNT(*) AS BIGINT) AS all_t
        |  FROM fp GROUP BY 1),
        |tot AS (SELECT SUM(all_t) AS n_total, SUM(dd) AS n_events
        |        FROM grid),
        |yv AS (
        |  SELECT g.t, g.dd, tot.n_total,
        |    tot.n_total - COALESCE(SUM(g.all_t) OVER (ORDER BY g.t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS y
        |  FROM grid g, tot),
        |lf AS (
        |  SELECT t, dd, n_total, y,
        |    LN(GREATEST(1.0 - CAST(dd AS DOUBLE) / y, 1e-300)) AS lnf
        |  FROM yv),
        |km AS (
        |  SELECT t, dd, n_total,
        |    exp(COALESCE(SUM(lnf) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
        |      AS s_prev,
        |    exp(SUM(lnf) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS s_incl
        |  FROM lf),
        |ev AS (
        |  SELECT t, s_incl,
        |    CAST(ROUND(s_prev * (t - COALESCE(lag(t) OVER (ORDER BY t),
        |      0)) * 1e6) AS BIGINT) AS term_u
        |  FROM km WHERE dd > 0 AND t <= 14),
        |st AS (
        |  SELECT COALESCE(SUM(term_u), 0) AS su,
        |    MAX_BY(s_incl, t) AS last_s, MAX(t) AS last_t
        |  FROM ev)
        |SELECT CAST(tot.n_total AS BIGINT) AS n_users,
        |  CAST(tot.n_events AS BIGINT) AS n_events,
        |  ROUND((st.su + COALESCE(CAST(ROUND(st.last_s
        |    * (14 - st.last_t) * 1e6) AS BIGINT), 14000000)) / 1e6, 6)
        |    AS rmst_14d
        |FROM st, tot""".stripMargin),

    // identical per-step snapped CIF terms
    "q_cuminc_competing" ->
      """WITH pu AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t0,
        |    MAX(epoch_us(ts)) AS tl,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
        |      END) AS tp,
        |    MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts)
        |      END) AS te
        |  FROM events GROUP BY 1),
        |fp AS (
        |  SELECT CASE
        |      WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
        |        THEN (tp - t0) // 86400000000
        |      WHEN te IS NOT NULL THEN (te - t0) // 86400000000
        |      ELSE (tl - t0) // 86400000000 END AS t,
        |    CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
        |        THEN 1
        |      WHEN te IS NOT NULL THEN 2 ELSE 0 END AS cause
        |  FROM pu),
        |grid AS (
        |  SELECT t,
        |    CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d1,
        |    CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d2,
        |    CAST(COUNT(*) AS BIGINT) AS all_t
        |  FROM fp GROUP BY 1),
        |tot AS (SELECT SUM(all_t) AS n_total, SUM(d1) AS e1,
        |          SUM(d2) AS e2 FROM grid),
        |yv AS (
        |  SELECT g.t, g.d1, g.d2, tot.n_total, tot.e1, tot.e2,
        |    tot.n_total - COALESCE(SUM(g.all_t) OVER (ORDER BY g.t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS y
        |  FROM grid g, tot),
        |lf AS (
        |  SELECT *, LN(GREATEST(1.0 - CAST(d1 + d2 AS DOUBLE) / y,
        |    1e-300)) AS lnf
        |  FROM yv),
        |km AS (
        |  SELECT t, d1, d2, n_total, e1, e2, y,
        |    exp(COALESCE(SUM(lnf) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
        |      AS s_prev
        |  FROM lf)
        |SELECT CAST(MAX(n_total) AS BIGINT) AS n_users,
        |  CAST(MAX(e1) AS BIGINT) AS n_purchase,
        |  CAST(MAX(e2) AS BIGINT) AS n_error,
        |  ROUND(SUM(CAST(ROUND(s_prev * d1 / y * 1e9) AS BIGINT))
        |    / 1e9, 6) AS cif_purchase_14d,
        |  ROUND(SUM(CAST(ROUND(s_prev * d2 / y * 1e9) AS BIGINT))
        |    / 1e9, 6) AS cif_error_14d
        |FROM km WHERE t <= 14""".stripMargin,

    // identical snapped d/Y steps
    "q_mcf_recurrent" ->
      """WITH f AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t0,
        |    (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 86400000000
        |      AS fu
        |  FROM events GROUP BY 1),
        |offs AS (
        |  SELECT (epoch_us(e.ts) - f.t0) // 86400000000 AS s0,
        |    CAST(COUNT(*) AS BIGINT) AS ds
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1),
        |yg AS (SELECT fu, CAST(COUNT(*) AS BIGINT) AS cf
        |       FROM f GROUP BY 1),
        |steps AS (
        |  SELECT o.s0, o.ds, SUM(yg.cf) AS ys,
        |    CAST(ROUND(CAST(o.ds AS DOUBLE) / SUM(yg.cf) * 1e9)
        |      AS BIGINT) AS inc_u
        |  FROM offs o JOIN yg ON yg.fu >= o.s0
        |  GROUP BY o.s0, o.ds),
        |taus AS (SELECT UNNEST([7, 14, 21]) AS tau)
        |SELECT CAST(taus.tau AS BIGINT) AS t_days,
        |  COALESCE(CAST(SUM(steps.ds) AS BIGINT), 0) AS n_purchases,
        |  ROUND(COALESCE(SUM(steps.inc_u), 0) / 1e9, 6) AS mcf
        |FROM taus LEFT JOIN steps ON steps.s0 <= taus.tau
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical snapshot aging buckets
    "q_backlog_aging" ->
      """WITH ms AS (
        |  SELECT l_orderkey, MAX(l_shipdate) AS maxship
        |  FROM lineitem GROUP BY 1),
        |open_ AS (
        |  SELECT o.o_orderkey,
        |    CAST(DATE '1997-01-01'
        |      - CAST(o.o_orderdate AS DATE) AS BIGINT) AS age,
        |    CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders o JOIN ms ON o.o_orderkey = ms.l_orderkey
        |  WHERE o.o_orderdate <= TIMESTAMP '1997-01-01'
        |    AND ms.maxship > TIMESTAMP '1997-01-01'),
        |bk AS (
        |  SELECT CASE WHEN age <= 30 THEN '000-030'
        |      WHEN age <= 90 THEN '031-090'
        |      WHEN age <= 180 THEN '091-180'
        |      ELSE '180+' END AS bucket, v
        |  FROM open_),
        |tot AS (SELECT SUM(v) AS tv FROM bk)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  ROUND(CAST(SUM(v) AS DOUBLE) / MAX(tot.tv), 6)
        |    AS value_share
        |FROM bk, tot GROUP BY bucket ORDER BY bucket""".stripMargin,

    // identical per-order perfect flags
    "q_perfect_order" ->
      """WITH per AS (
        |  SELECT o.o_orderkey, o.o_orderpriority,
        |    MAX(CAST(l.l_shipdate AS DATE)
        |      - CAST(o.o_orderdate AS DATE)) AS max_lag,
        |    SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS n_returned
        |  FROM lineitem l JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2)
        |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN max_lag <= 30 AND n_returned = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_perfect,
        |  ROUND(CAST(SUM(CASE WHEN max_lag <= 30 AND n_returned = 0
        |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
        |    AS perfect_rate
        |FROM per GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    // identical person-time ratio chain
    "q_incidence_rate_ratio" ->
      """WITH per AS (
        |  SELECT user_id % 2 AS g,
        |    (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 86400000000
        |      AS fu,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS np
        |  FROM events GROUP BY user_id),
        |ag AS (
        |  SELECT g, SUM(np) AS e, SUM(fu) AS pt FROM per GROUP BY 1),
        |pv AS (
        |  SELECT MAX(CASE WHEN g = 1 THEN e END) AS e1,
        |    MAX(CASE WHEN g = 1 THEN pt END) AS pt1,
        |    MAX(CASE WHEN g = 0 THEN e END) AS e0,
        |    MAX(CASE WHEN g = 0 THEN pt END) AS pt0
        |  FROM ag),
        |ir AS (
        |  SELECT e1, pt1, e0, pt0,
        |    (CAST(e1 AS DOUBLE) / pt1) / (CAST(e0 AS DOUBLE) / pt0)
        |      AS irr,
        |    sqrt(1.0 / e1 + 1.0 / e0) AS sel
        |  FROM pv
        |  WHERE e1 > 0 AND e0 > 0 AND pt1 > 0 AND pt0 > 0)
        |SELECT CAST(e1 AS BIGINT) AS events_g1,
        |  CAST(pt1 AS BIGINT) AS days_g1,
        |  CAST(e0 AS BIGINT) AS events_g0,
        |  CAST(pt0 AS BIGINT) AS days_g0,
        |  ROUND(irr, 6) AS irr,
        |  ROUND(exp(LN(irr) - 1.96 * sel), 6) AS ci_lo,
        |  ROUND(exp(LN(irr) + 1.96 * sel), 6) AS ci_hi
        |FROM ir""".stripMargin
  )
}
