package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 52 (SURVEY.md §2 B.10b): the van den Broek
  * zero-inflation score test on per-user purchase counts, the
  * overlapping coefficient (OVL) between weekend/weekday value
  * histograms, mean residual life at the revenue percentiles
  * {50, 75, 90} (EVT diagnostic), trading-day adjustment of monthly
  * revenue by snapped weekday factors, a CART Gini stump over the
  * centi score grid (exact argmax), and the Kendall distance +
  * Spearman footrule between the revenue and quantity brand
  * rankings.
  */
object StatsR9zy {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Zero-inflation score test: λ̂ = mean purchases/user, S =
    // (n0 − n·p0)² / (n·p0(1−p0) − n·λ̂·p0²), p0 = e^{−λ̂}.
    "q_zero_inflation" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("k"))
      per.agg(count(lit(1)).as("n"), sum("k").as("sk"),
          sum(when(col("k") === 0, 1L).otherwise(0L)).as("n0"))
        .withColumn("lam", col("sk").cast("double") / col("n"))
        .withColumn("p0", exp(-col("lam")))
        .withColumn("den", col("n") * col("p0") * (lit(1.0) - col("p0"))
          - col("n") * col("lam") * col("p0") * col("p0"))
        .filter(col("den") > 0)
        .select(col("n").as("n_users"),
          round(col("lam"), 6).as("lambda_hat"),
          col("n0").as("observed_zeros"),
          round(col("n") * col("p0"), 4).as("expected_zeros"),
          round(pow(col("n0") - col("n") * col("p0"), 2) / col("den"),
            6).as("score_stat"))
    }),

    // Overlapping coefficient between weekend/weekday value
    // histograms (20 equi-width buckets, stated): per-bucket
    // min(n1/N1, n2/N2) snapped to 1e9, exact sum.
    "q_distribution_overlap" -> ((s, d) => {
      val b = Tables.events(s, d)
        .select(when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L)
          .as("we"),
          least(floor(col("value") / 10).cast("long"), lit(19L))
            .as("bk"))
        .groupBy("bk")
        .agg(sum(when(col("we") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("we") === 0, 1L).otherwise(0L)).as("n2"))
        .localCheckpoint(eager = true)
      val tot = b.agg(sum("n1").as("t1"), sum("n2").as("t2"))
      b.crossJoin(broadcast(tot))
        .withColumn("term_u", round(
          least(col("n1").cast("double") / col("t1"),
            col("n2").cast("double") / col("t2")) * 1e9).cast("long"))
        .agg(max("t1").as("n_weekend"), max("t2").as("n_weekday"),
          sum("term_u").as("su"))
        .select(col("n_weekend"), col("n_weekday"),
          round(col("su") / 1e9, 6).as("ovl"))
    }),

    // Mean residual life at the type-1 revenue percentiles
    // {50, 75, 90}: MRL(u) = mean(x − u | x > u), exact sums.
    "q_mean_residual_life" -> ((s, d) => {
      import s.implicits._
      // customer-grain global rank → range-partitioned (r10 VERDICT
      // task 4); n = max rank off the cheap checkpointed rank table
      val ranked = graft.operators.PrefixSum.rank(
        StatsR9ze.custRev(s, d), Seq(col("x").asc, col("c").asc), "rk")
      val rk = ranked
        .crossJoin(broadcast(ranked.agg(max("rk").as("n"))))
        .localCheckpoint(eager = true)
      val ps = Seq(50L, 75L, 90L).toDF("p")
      val thr = rk.crossJoin(broadcast(ps))
        .filter(col("rk") === expr("(n * p + 99) div 100"))
        .select(col("p"), col("x").as("u"))
      rk.crossJoin(broadcast(thr))
        .filter(col("x") > col("u"))
        .groupBy("p", "u")
        .agg(count(lit(1)).as("n_exceed"),
          sum(col("x") - col("u")).as("sex"))
        .select(col("p").as("percentile"),
          round(col("u") / 100.0, 2).as("threshold"),
          col("n_exceed"),
          round(col("sex").cast("double") / col("n_exceed") / 100, 2)
            .as("mean_residual_life"))
        .orderBy("percentile")
    }),

    // Trading-day adjustment: weekday factors = weekday mean daily
    // revenue / overall mean daily revenue (snapped 1e6); month index
    // = mean factor over the month's observed days; adjusted =
    // actual / index.
    "q_trading_day_adjust" -> ((s, d) => {
      val day = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").cast("date").as("dd"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("rev"))
        .withColumn("wd", dayofweek(col("dd")).cast("long"))
        .withColumn("m", date_trunc("month", col("dd")).cast("date"))
        .localCheckpoint(eager = true)
      val wf = day.groupBy("wd")
        .agg(sum("rev").as("sr"), count(lit(1)).as("nd"))
      val tot = day.agg(sum("rev").as("tr"), count(lit(1)).as("td"))
      val f = wf.crossJoin(broadcast(tot))
        .select(col("wd"),
          round((col("sr").cast("double") / col("nd"))
            / (col("tr").cast("double") / col("td")) * 1e6)
            .cast("long").as("f_u"))
      day.join(broadcast(f), "wd")
        .groupBy("m")
        .agg(sum("rev").as("actual"), count(lit(1)).as("nd"),
          sum("f_u").as("sf"))
        .select(col("m").cast("string").as("month"),
          round(col("actual") / 100.0, 2).as("actual_revenue"),
          round(col("sf").cast("double") / col("nd") / 1e6, 6)
            .as("trading_day_index"),
          round(col("actual").cast("double")
            / (col("sf").cast("double") / col("nd") / 1e6) / 100, 2)
            .as("adjusted_revenue"))
        .orderBy("month")
    }),

    // CART Gini stump on the centi score grid (split: v < t):
    // maximize (posL²+negL²)/nL + (posR²+negR²)/nR (exact-long
    // squares, identical doubles), argmax (score DESC, t ASC).
    "q_gini_stump" -> ((s, d) => {
      val g = Tables.events(s, d)
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"))
        .groupBy("v")
        .agg(sum("y").as("pos"), sum(lit(1L) - col("y")).as("neg"))
      // bounded grain: distinct quantized cent values (generator grid)
      val wB = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = g.agg(sum("pos").as("p"), sum("neg").as("q"))
      val sc = g
        .withColumn("pl", coalesce(sum("pos").over(wB), lit(0L)))
        .withColumn("ql", coalesce(sum("neg").over(wB), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("nl", col("pl") + col("ql"))
        .withColumn("nr", col("p") + col("q") - col("nl"))
        .filter(col("nl") > 0 && col("nr") > 0)
        .withColumn("score",
          (col("pl") * col("pl") + col("ql") * col("ql"))
            .cast("double") / col("nl")
          + ((col("p") - col("pl")) * (col("p") - col("pl"))
            + (col("q") - col("ql")) * (col("q") - col("ql")))
            .cast("double") / col("nr"))
        .orderBy(col("score").desc, col("v").asc)
        .limit(1)
      sc.select(round(col("v") / 100.0, 2).as("best_threshold"),
        round(lit(1.0) - (col("p") * col("p") + col("q") * col("q"))
          .cast("double") / ((col("p") + col("q"))
            * (col("p") + col("q"))), 6).as("gini_before"),
        round(lit(1.0) - col("score") / (col("p") + col("q")), 6)
          .as("gini_after"),
        round((col("score") - (col("p") * col("p") + col("q") * col("q"))
          .cast("double") / (col("p") + col("q")))
          / (col("p") + col("q")), 6).as("gini_gain"))
    }),

    // Kendall distance + Spearman footrule between the brand
    // rankings by revenue and by quantity (DESC, brand tie-break).
    "q_rank_distance" -> ((s, d) => {
      val br = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("rev"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .withColumn("r1", row_number().over(
          // bounded grain: one row per brand (bounded brand set)
          Window.orderBy(col("rev").desc, col("p_brand").asc))
          .cast("long"))
        .withColumn("r2", row_number().over(
          Window.orderBy(col("qty").desc, col("p_brand").asc))
          .cast("long"))
        .localCheckpoint(eager = true)
      val disc = br.select(col("p_brand").as("b1"), col("r1").as("a1"),
          col("r2").as("a2"))
        .join(br.select(col("p_brand").as("b2"), col("r1").as("c1"),
          col("r2").as("c2")), col("b1") < col("b2"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when((col("a1") < col("c1")) =!= (col("a2") < col("c2")),
            1L).otherwise(0L)).as("discordant"))
      val foot = br.agg(count(lit(1)).as("n_brands"),
        sum(abs(col("r1") - col("r2"))).as("footrule"))
      disc.crossJoin(broadcast(foot))
        .select(col("n_brands"), col("discordant"),
          round(col("discordant").cast("double") / col("n_pairs"), 6)
            .as("kendall_distance"),
          col("footrule"))
    })
  )

  val oracle: Map[String, String] = Map(
    // identical score-test chain
    "q_zero_inflation" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(k) AS sk,
        |    CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0
        |  FROM per),
        |st AS (
        |  SELECT n, n0, CAST(sk AS DOUBLE) / n AS lam,
        |    exp(-CAST(sk AS DOUBLE) / n) AS p0
        |  FROM ag),
        |dn AS (
        |  SELECT *, n * p0 * (1.0 - p0) - n * lam * p0 * p0 AS den
        |  FROM st)
        |SELECT n AS n_users, ROUND(lam, 6) AS lambda_hat,
        |  n0 AS observed_zeros,
        |  ROUND(n * p0, 4) AS expected_zeros,
        |  ROUND(POW(n0 - n * p0, 2) / den, 6) AS score_stat
        |FROM dn WHERE den > 0""".stripMargin,

    // identical snapped bucket minima
    "q_distribution_overlap" ->
      """WITH b AS (
        |  SELECT LEAST(CAST(FLOOR(value / 10) AS BIGINT), 19) AS bk,
        |    CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0
        |      END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN dayofweek(ts) NOT IN (0, 6) THEN 1
        |      ELSE 0 END) AS BIGINT) AS n2
        |  FROM events GROUP BY 1),
        |tot AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM b),
        |terms AS (
        |  SELECT CAST(ROUND(LEAST(CAST(n1 AS DOUBLE) / t1,
        |    CAST(n2 AS DOUBLE) / t2) * 1e9) AS BIGINT) AS term_u,
        |    tot.t1, tot.t2
        |  FROM b, tot)
        |SELECT CAST(MAX(t1) AS BIGINT) AS n_weekend,
        |  CAST(MAX(t2) AS BIGINT) AS n_weekday,
        |  ROUND(SUM(term_u) / 1e9, 6) AS ovl
        |FROM terms""".stripMargin,

    // identical type-1 thresholds and excess means
    "q_mean_residual_life" ->
      (s"WITH ${StatsR9ze.crCte}," +
      """
        |rk AS (
        |  SELECT x,
        |    CAST(row_number() OVER (ORDER BY x, c) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM cr),
        |ps AS (SELECT UNNEST([50, 75, 90]) AS p),
        |thr AS (
        |  SELECT ps.p, rk.x AS u
        |  FROM rk, ps WHERE rk.rk = (rk.n * ps.p + 99) // 100),
        |ex AS (
        |  SELECT thr.p, thr.u, CAST(COUNT(*) AS BIGINT) AS n_exceed,
        |    SUM(rk.x - thr.u) AS sex
        |  FROM rk, thr WHERE rk.x > thr.u
        |  GROUP BY 1, 2)
        |SELECT CAST(p AS BIGINT) AS percentile,
        |  ROUND(u / 100.0, 2) AS threshold, n_exceed,
        |  ROUND(CAST(sex AS DOUBLE) / n_exceed / 100, 2)
        |    AS mean_residual_life
        |FROM ex ORDER BY percentile""".stripMargin),

    // identical snapped weekday factors
    "q_trading_day_adjust" ->
      """WITH day AS (
        |  SELECT CAST(l_shipdate AS DATE) AS dd,
        |    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev
        |  FROM lineitem GROUP BY 1),
        |dw AS (
        |  SELECT dd, rev, CAST(dayofweek(dd) AS BIGINT) AS wd,
        |    CAST(date_trunc('month', dd) AS DATE) AS m
        |  FROM day),
        |wf AS (
        |  SELECT wd, SUM(rev) AS sr, CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM dw GROUP BY 1),
        |tot AS (SELECT SUM(rev) AS tr, CAST(COUNT(*) AS BIGINT) AS td
        |        FROM dw),
        |f AS (
        |  SELECT wd,
        |    CAST(ROUND((CAST(sr AS DOUBLE) / nd)
        |      / (CAST(tr AS DOUBLE) / td) * 1e6) AS BIGINT) AS f_u
        |  FROM wf, tot)
        |SELECT CAST(dw.m AS VARCHAR) AS month,
        |  ROUND(SUM(dw.rev) / 100.0, 2) AS actual_revenue,
        |  ROUND(CAST(SUM(f.f_u) AS DOUBLE) / COUNT(*) / 1e6, 6)
        |    AS trading_day_index,
        |  ROUND(CAST(SUM(dw.rev) AS DOUBLE)
        |    / (CAST(SUM(f.f_u) AS DOUBLE) / COUNT(*) / 1e6) / 100, 2)
        |    AS adjusted_revenue
        |FROM dw JOIN f ON dw.wd = f.wd
        |GROUP BY dw.m ORDER BY month""".stripMargin,

    // identical exact-square stump sweep
    "q_gini_stump" ->
      """WITH g AS (
        |  SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS pos,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1
        |      END) AS BIGINT) AS neg
        |  FROM events GROUP BY 1),
        |tot AS (SELECT SUM(pos) AS p, SUM(neg) AS q FROM g),
        |cum AS (
        |  SELECT v,
        |    COALESCE(SUM(pos) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS pl,
        |    COALESCE(SUM(neg) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS ql
        |  FROM g),
        |sc AS (
        |  SELECT cum.v, tot.p, tot.q,
        |    CAST(cum.pl * cum.pl + cum.ql * cum.ql AS DOUBLE)
        |      / (cum.pl + cum.ql)
        |    + CAST((tot.p - cum.pl) * (tot.p - cum.pl)
        |      + (tot.q - cum.ql) * (tot.q - cum.ql) AS DOUBLE)
        |      / (tot.p + tot.q - cum.pl - cum.ql) AS score
        |  FROM cum, tot
        |  WHERE cum.pl + cum.ql > 0
        |    AND tot.p + tot.q - cum.pl - cum.ql > 0),
        |best AS (
        |  SELECT * FROM sc ORDER BY score DESC, v ASC LIMIT 1)
        |SELECT ROUND(v / 100.0, 2) AS best_threshold,
        |  ROUND(1.0 - CAST(p * p + q * q AS DOUBLE)
        |    / ((p + q) * (p + q)), 6) AS gini_before,
        |  ROUND(1.0 - score / (p + q), 6) AS gini_after,
        |  ROUND((score - CAST(p * p + q * q AS DOUBLE) / (p + q))
        |    / (p + q), 6) AS gini_gain
        |FROM best""".stripMargin,

    // identical dual rankings
    "q_rank_distance" ->
      """WITH br AS (
        |  SELECT p.p_brand,
        |    SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
        |      AS rev,
        |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |rk AS (
        |  SELECT p_brand,
        |    CAST(row_number() OVER (ORDER BY rev DESC, p_brand ASC)
        |      AS BIGINT) AS r1,
        |    CAST(row_number() OVER (ORDER BY qty DESC, p_brand ASC)
        |      AS BIGINT) AS r2
        |  FROM br),
        |disc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN (a.r1 < b.r1) <> (a.r2 < b.r2)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS discordant
        |  FROM rk a JOIN rk b ON a.p_brand < b.p_brand),
        |foot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
        |    CAST(SUM(ABS(r1 - r2)) AS BIGINT) AS footrule
        |  FROM rk)
        |SELECT n_brands, discordant,
        |  ROUND(CAST(discordant AS DOUBLE) / n_pairs, 6)
        |    AS kendall_distance,
        |  footrule
        |FROM disc, foot""".stripMargin
  )
}
