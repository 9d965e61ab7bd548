package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 13 (SURVEY.md §2 B.10b): product analytics over the
  * event domain — the
  * time-WINDOWED funnel (1-h completion constraint), linear multi-
  * touch attribution (per-purchase credit 1/k snapped to 1e6),
  * weekly growth accounting (new/retained/resurrected/churned),
  * a stepped-half-life decay score (integer shift — EXACT, no pow
  * ulp surface), peak session concurrency by sweep line (starts
  * before ends at equal µs, stated), and the repurchase cycle
  * (med2 median of exact day gaps). Exact integers throughout.
  */
object StatsR9m {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Time-windowed funnel view→click→purchase, all within 1 h of the
    // FIRST view (the ClickHouse windowFunnel semantics, strict >):
    // three chained conditional mins per user, one corpus scan.
    "q_funnel_window" -> ((s, d) => {
      val hour = 3600000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .localCheckpoint(eager = true) // 3 legs
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + hour)
        .groupBy("user_id").agg(min("us").as("t2"), min("t1").as("t1b"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t1b") + hour)
        .groupBy("user_id").agg(min("us").as("t3"))
      v.agg(count(lit(1)).as("n_level1")).crossJoin(
          c.agg(count(lit(1)).as("n_level2")))
        .crossJoin(p.agg(count(lit(1)).as("n_level3")))
        .select(col("n_level1"), col("n_level2"), col("n_level3"),
          round(col("n_level3").cast("double") / col("n_level1"), 6)
            .as("conv_1h"))
    }),

    // Linear multi-touch attribution: each purchase splits one unit
    // of credit evenly across the user's non-purchase touches in the
    // prior 7 days (strict before); per-touch credit snapped to a
    // 1e6 long BEFORE the cross-channel sum; untouched purchases
    // credit 'direct'. One user-partitioned range join.
    "q_attribution_linear" -> ((s, d) => {
      val week = 604800000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .localCheckpoint(eager = true) // 2 legs
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          col("us").as("pus"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("channel"),
          col("us").as("tus"))
      val joined = buys.join(touches, Seq("user_id"), "left")
        .withColumn("hit", col("tus").isNotNull
          && col("tus") < col("pus")
          && col("tus") >= col("pus") - week)
      val k = joined.groupBy("pid")
        .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("k"))
      joined.filter(col("hit")).join(k, "pid")
        .select(col("channel"),
          round(lit(1e6) / col("k")).cast("long").as("c_u"))
        .union(k.filter(col("k") === 0)
          .select(lit("direct").as("channel"), lit(1000000L).as("c_u")))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touches"),
          round(sum("c_u") / 1e6, 4).as("credit"))
        .orderBy("channel")
    }),

    // Weekly growth accounting: per (user, active week) status —
    // new (first week), retained (active the prior calendar week),
    // resurrected (returning after ≥1 skipped week) — plus churned
    // (active prior week, absent this week, counted ON this week).
    // One distinct grid, two lag windows, one successor self-join.
    "q_growth_accounting" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("week", to_date(col("ts"))).cast("date").as("w"))
        .distinct()
        .localCheckpoint(eager = true) // 2 legs
      val wwin = Window.partitionBy("user_id").orderBy("w")
      val st = wk
        .withColumn("pw", lag("w", 1).over(wwin))
        .select(col("w"),
          when(col("pw").isNull, "new")
            .when(col("pw") === date_sub(col("w"), 7), "retained")
            .otherwise("resurrected").as("status"))
        .groupBy("w").pivot("status",
          Seq("new", "retained", "resurrected"))
        .count().na.fill(0L)
      val churn = wk.select(date_add(col("w"), 7).as("w"),
          col("user_id"))
        .join(wk.select(col("w"), col("user_id"), lit(1).as("hit")),
          Seq("w", "user_id"), "left")
        .filter(col("hit").isNull)
        .groupBy("w").agg(count(lit(1)).as("n_churned"))
      st.join(churn, Seq("w"), "left").na.fill(0L, Seq("n_churned"))
        .select(col("w").cast("string").as("week"),
          col("new").as("n_new"), col("retained").as("n_retained"),
          col("resurrected").as("n_resurrected"), col("n_churned"))
        .orderBy("week")
    }),

    // Stepped-half-life engagement score per user: weight = 1e9 >>
    // (days-old div 7) — an integer SHIFT, exact in both engines (no
    // pow/exp ulp surface, stated convention), summed exactly.
    "q_decay_score" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("ed"))
      val hz = ev.agg(max("ed").as("hd"))
      ev.crossJoin(broadcast(hz))
        .withColumn("k", datediff(col("hd"), col("ed")).cast("long"))
        .withColumn("w_u", expr(
          "shiftright(1000000000L, cast(least(k div 7, 30) as int))"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum("w_u") / 1e9, 4).as("decay_score"))
        .orderBy("user_id")
    }),

    // Peak session concurrency: sessions = per-user gaps-and-islands
    // (new session at gap ≥ 30 min, strict — spelled identically in
    // the oracle rather than via session_window, whose boundary
    // convention the oracle could not mirror); sweep line with
    // starts-before-ends at equal µs (stated), exact prefix max.
    "q_peak_concurrency" -> ((s, d) => {
      val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("pus", lag("us", 1).over(wu))
        .withColumn("brk", when(col("pus").isNull
          || col("us") - col("pus") >= 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum("brk").over(
          wu.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(min("us").as("s_start"), max("us").as("s_end"))
        .localCheckpoint(eager = true) // 2 sweep legs
      val sweep = sess.select(col("s_start").as("ts"), lit(1L).as("delta"))
        .union(sess.select(col("s_end").as("ts"), lit(-1L).as("delta")))
      val wsweep = Window.orderBy(col("ts"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val run = sweep.withColumn("conc", sum("delta").over(wsweep))
      val mx = run.agg(max("conc").as("peak"))
      sess.agg(count(lit(1)).as("n_sessions")).crossJoin(mx)
        .crossJoin(run.join(mx, col("conc") === col("peak"))
          .agg(min("ts").as("peak_at_us")))
        .select(col("n_sessions"), col("peak").as("peak_concurrency"),
          col("peak_at_us"))
    }),

    // Repurchase cycle: exact day gaps between a user's consecutive
    // purchases ((t2−t1) div 86400e6), pooled; med2 median (the
    // q_levene_bf convention) and the exact-sum mean.
    "q_repurchase_cycle" -> ((s, d) => {
      val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
      val gaps = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("pus", lag("us", 1).over(wu))
        .filter(col("pus").isNotNull)
        .select(expr("(us - pus) div 86400000000").as("g"),
          col("user_id"), col("event_id"))
      // gap-grain global rank → range-partitioned; n = max rank off
      // the cheap checkpointed rank table (r10 VERDICT task 4)
      val ranked = graft.operators.PrefixSum.rank(gaps,
        Seq(col("g"), col("user_id"), col("event_id")), "rn")
      ranked
        .crossJoin(broadcast(ranked.agg(max("rn").as("n"))))
        .withColumn("p1", expr("(n + 1) div 2"))
        .withColumn("p2", expr("n div 2 + 1"))
        .agg(max("n").as("n_gaps"), sum("g").as("sg"),
          (sum(when(col("rn") === col("p1"), col("g")).otherwise(0L))
            + sum(when(col("rn") === col("p2"), col("g")).otherwise(0L)))
            .as("med2"))
        .select(col("n_gaps"),
          round(col("med2") / 2.0, 1).as("median_days"),
          round(col("sg").cast("double") / col("n_gaps"), 4)
            .as("mean_days"))
    })
  )

  val oracle: Map[String, String] = Map(
    // identical chained conditional mins
    "q_funnel_window" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT ev.user_id, MIN(us) AS t2, MIN(v.t1) AS t1b
        |  FROM ev JOIN v ON ev.user_id = v.user_id
        |  WHERE ev.event_type = 'click' AND ev.us > v.t1
        |    AND ev.us <= v.t1 + 3600000000
        |  GROUP BY 1),
        |p AS (
        |  SELECT ev.user_id, MIN(us) AS t3
        |  FROM ev JOIN c ON ev.user_id = c.user_id
        |  WHERE ev.event_type = 'purchase' AND ev.us > c.t2
        |    AND ev.us <= c.t1b + 3600000000
        |  GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_level1,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_level2,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_level3,
        |  ROUND((SELECT CAST(COUNT(*) AS DOUBLE) FROM p)
        |    / (SELECT COUNT(*) FROM v), 6) AS conv_1h""".stripMargin,

    // identical snapped per-touch credits and direct branch
    "q_attribution_linear" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        |  FROM events),
        |buys AS (
        |  SELECT user_id, event_id AS pid, us AS pus FROM ev
        |  WHERE event_type = 'purchase'),
        |tch AS (
        |  SELECT user_id, event_type AS channel, us AS tus FROM ev
        |  WHERE event_type <> 'purchase'),
        |j AS (
        |  SELECT buys.pid, tch.channel,
        |    tch.tus IS NOT NULL AND tch.tus < buys.pus
        |      AND tch.tus >= buys.pus - 604800000000 AS hit
        |  FROM buys LEFT JOIN tch ON buys.user_id = tch.user_id),
        |k AS (
        |  SELECT pid,
        |    CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM j GROUP BY 1),
        |cr AS (
        |  SELECT j.channel,
        |    CAST(ROUND(1e6 / k.k) AS BIGINT) AS c_u
        |  FROM j JOIN k ON j.pid = k.pid WHERE j.hit
        |  UNION ALL
        |  SELECT 'direct', 1000000 FROM k WHERE k = 0)
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  ROUND(CAST(SUM(c_u) AS BIGINT) / 1e6, 4) AS credit
        |FROM cr GROUP BY 1 ORDER BY channel""".stripMargin,

    // identical lag-status split and successor-join churn
    "q_growth_accounting" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS w
        |  FROM events),
        |st AS (
        |  SELECT w,
        |    CASE WHEN pw IS NULL THEN 'new'
        |      WHEN pw = w - 7 THEN 'retained'
        |      ELSE 'resurrected' END AS status
        |  FROM (SELECT w,
        |          lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw
        |        FROM wk)),
        |pv AS (
        |  SELECT w,
        |    CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new,
        |    CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_resurrected
        |  FROM st GROUP BY 1),
        |ch AS (
        |  SELECT a.w + 7 AS w, CAST(COUNT(*) AS BIGINT) AS n_churned
        |  FROM wk a LEFT JOIN wk b
        |    ON b.user_id = a.user_id AND b.w = a.w + 7
        |  WHERE b.user_id IS NULL
        |  GROUP BY 1)
        |SELECT CAST(pv.w AS VARCHAR) AS week, n_new, n_retained,
        |  n_resurrected, COALESCE(ch.n_churned, 0) AS n_churned
        |FROM pv LEFT JOIN ch ON pv.w = ch.w
        |ORDER BY week""".stripMargin,

    // identical integer-shift weights
    "q_decay_score" ->
      """WITH hz AS (SELECT MAX(CAST(ts AS DATE)) AS hd FROM events),
        |t AS (
        |  SELECT user_id,
        |    1000000000 >> CAST(LEAST(
        |      datediff('day', CAST(ts AS DATE), (SELECT hd FROM hz))
        |        // 7, 30) AS INT) AS w_u
        |  FROM events)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  ROUND(CAST(SUM(w_u) AS BIGINT) / 1e9, 4) AS decay_score
        |FROM t GROUP BY 1 ORDER BY user_id""".stripMargin,

    // identical gaps-and-islands sessions and sweep order
    "q_peak_concurrency" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |brk AS (
        |  SELECT user_id, us,
        |    CASE WHEN pus IS NULL OR us - pus >= 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM (SELECT user_id, us, event_id,
        |          lag(us) OVER (PARTITION BY user_id
        |            ORDER BY us, event_id) AS pus
        |        FROM ev)),
        |sid AS (
        |  SELECT user_id, us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM brk),
        |sess AS (
        |  SELECT user_id, sid, MIN(us) AS s_start, MAX(us) AS s_end
        |  FROM sid GROUP BY 1, 2),
        |sweep AS (
        |  SELECT s_start AS ts, CAST(1 AS BIGINT) AS delta FROM sess
        |  UNION ALL
        |  SELECT s_end, CAST(-1 AS BIGINT) FROM sess),
        |run AS (
        |  SELECT ts,
        |    CAST(SUM(delta) OVER (ORDER BY ts, delta DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS conc
        |  FROM sweep),
        |mx AS (SELECT MAX(conc) AS peak FROM run)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sess)
        |    AS n_sessions,
        |  mx.peak AS peak_concurrency,
        |  (SELECT MIN(ts) FROM run, mx WHERE run.conc = mx.peak)
        |    AS peak_at_us
        |FROM mx""".stripMargin,

    // identical exact day gaps and med2 median
    "q_repurchase_cycle" ->
      """WITH pu AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT (us - pus) // 86400000000 AS g, user_id, event_id
        |  FROM (SELECT user_id, event_id, us,
        |          lag(us) OVER (PARTITION BY user_id
        |            ORDER BY us, event_id) AS pus
        |        FROM pu)
        |  WHERE pus IS NOT NULL),
        |rk AS (
        |  SELECT g,
        |    CAST(row_number() OVER (ORDER BY g, user_id, event_id)
        |      AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM g),
        |ag AS (
        |  SELECT MAX(n) AS n_gaps, CAST(SUM(g) AS BIGINT) AS sg,
        |    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN g ELSE 0 END)
        |      + SUM(CASE WHEN rn = n // 2 + 1 THEN g ELSE 0 END)
        |      AS BIGINT) AS med2
        |  FROM rk)
        |SELECT n_gaps, ROUND(med2 / 2.0, 1) AS median_days,
        |  ROUND(CAST(sg AS DOUBLE) / n_gaps, 4) AS mean_days
        |FROM ag""".stripMargin
  )
}
