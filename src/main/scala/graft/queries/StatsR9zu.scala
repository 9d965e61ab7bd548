package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Round-9 wave 48 (SURVEY.md §2 B.10b): survey-sampling estimators
  * on DETERMINISTIC samples (the repo's no-rand() doctrine) —
  * Horvitz-Thompson totals from the custkey%17 sample with the FPC
  * standard error, Neyman allocation across customer nations,
  * the cluster-sampling design effect (ANOVA ICC on user clusters),
  * Lincoln-Petersen/Chapman capture-recapture from two modular
  * captures, one-step raking of a sampled weekend×type table to the
  * full-population margins, and the post-stratified mean.
  *
  * All inputs are cent/milli-snapped; every estimator assembles from
  * exact long sums in one double chain.
  */
object StatsR9zu {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Horvitz-Thompson: π = 1/17 sample of customers (stated),
    // HT total = 17·Σ_s x; SRS-with-FPC se = N√((1−f)s²/n).
    "q_ht_estimator" -> ((s, d) => {
      val cr = StatsR9ze.custRev(s, d).localCheckpoint(eager = true)
      val tot = cr.agg(count(lit(1)).as("nn"), sum("x").as("tx"))
      val smp = cr.filter(col("c") % 17 === 0)
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      smp.crossJoin(broadcast(tot))
        .filter(col("n") > 1)
        .withColumn("s2", (col("n") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx"))
          / (col("n").cast("double") * (col("n") - 1)))
        .select(col("n").as("n_sample"), col("nn").as("n_population"),
          round(lit(17.0) * col("sx") / 100, 2).as("ht_total"),
          round(col("tx") / lit(100.0), 2).as("true_total"),
          round(abs(lit(17.0) * col("sx") - col("tx"))
            / col("tx"), 6).as("rel_err"),
          round(col("nn") * sqrt((lit(1.0)
            - col("n").cast("double") / col("nn"))
            * col("s2") / col("n")) / 100, 2).as("se_fpc"))
    }),

    // Neyman allocation of n=1000 across customer nations:
    // n_h ∝ N_h·S_h (sample sd of customer revenue per nation).
    "q_neyman_alloc" -> ((s, d) => {
      val cr = StatsR9ze.custRev(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("c") === col("c_custkey"))
      val st = cr.groupBy("c_nationkey")
        .agg(count(lit(1)).as("nh"), sum("x").as("sx"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
        .filter(col("nh") > 1)
        .withColumn("sh", sqrt((col("nh") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx"))
          / (col("nh").cast("double") * (col("nh") - 1))))
        .withColumn("w", col("nh") * col("sh"))
        .localCheckpoint(eager = true)
      val tot = st.agg(sum("w").as("sw"))
      st.crossJoin(broadcast(tot))
        .select(col("c_nationkey").as("nationkey"),
          col("nh").as("n_customers"),
          round(col("w") / col("sw"), 6).as("alloc_frac"),
          round(col("w") / col("sw") * 1000).cast("long")
            .as("alloc_n"))
        .orderBy("nationkey")
    }),

    // Design effect for user-clustered sampling of the purchase
    // indicator: ANOVA ICC with m0 = (N − Σm²/N)/(k−1) (stated),
    // DEFF = 1 + (m0 − 1)·ICC.
    "q_design_effect" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("m"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
        .localCheckpoint(eager = true)
      per.agg(count(lit(1)).as("k"), sum("m").as("nn"),
          sum("y").as("sy"),
          sum(col("m") * col("m")).as("sm2"),
          sum((col("y").cast("double") * col("y")) / col("m"))
            .as("ssb_part"))
        .withColumn("ssb", col("ssb_part")
          - col("sy").cast("double") * col("sy") / col("nn"))
        .withColumn("ssw", col("sy").cast("double") - col("ssb_part"))
        .withColumn("msb", col("ssb") / (col("k") - 1))
        .withColumn("msw", col("ssw") / (col("nn") - col("k")))
        .withColumn("m0", (col("nn").cast("double")
          - col("sm2").cast("double") / col("nn")) / (col("k") - 1))
        .filter(col("msb") + (col("m0") - 1) * col("msw") > 0)
        .withColumn("icc", (col("msb") - col("msw"))
          / (col("msb") + (col("m0") - 1) * col("msw")))
        .select(col("k").as("n_clusters"), col("nn").as("n_events"),
          round(col("m0"), 6).as("m0"),
          round(col("icc"), 6).as("icc"),
          round(lit(1.0) + (col("m0") - 1) * col("icc"), 6)
            .as("deff"))
    }),

    // Capture-recapture on customers with orders: captures %17 and
    // %13 (stated), Lincoln-Petersen n1·n2/m and the Chapman
    // correction vs the true count.
    "q_capture_recapture" -> ((s, d) => {
      val cr = StatsR9ze.custRev(s, d).localCheckpoint(eager = true)
      cr.agg(count(lit(1)).as("n_true"),
          sum(when(col("c") % 17 === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("c") % 13 === 0, 1L).otherwise(0L)).as("n2"),
          sum(when(col("c") % 17 === 0 && col("c") % 13 === 0, 1L)
            .otherwise(0L)).as("m"))
        .filter(col("m") > 0)
        .select(col("n_true"), col("n1"), col("n2"), col("m"),
          round(col("n1").cast("double") * col("n2") / col("m"), 4)
            .as("lincoln_petersen"),
          round((col("n1") + 1).cast("double") * (col("n2") + 1)
            / (col("m") + 1) - 1, 4).as("chapman"),
          round(abs((col("n1") + 1).cast("double") * (col("n2") + 1)
            / (col("m") + 1) - 1 - col("n_true"))
            / col("n_true"), 6).as("chapman_rel_err"))
    }),

    // One-step raking (row pass then column pass, stated) of the
    // event_id%7 sample's weekend×type table to the full-population
    // margins scaled to the sample size.
    "q_raking" -> ((s, d) => {
      val base = Tables.events(s, d)
        .select(when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L)
          .as("we"), col("event_type").as("t"), col("event_id"))
        .localCheckpoint(eager = true)
      val full = base.groupBy("we", "t").agg(count(lit(1)).as("f"))
      val smp = base.filter(col("event_id") % 7 === 0)
        .groupBy("we", "t").agg(count(lit(1)).as("s0"))
      val cells = full.join(smp, Seq("we", "t"))
        .localCheckpoint(eager = true)
      val tots = cells.agg(sum("f").as("ff"), sum("s0").as("ss"))
      val rowT = cells.groupBy("we").agg(sum("f").as("fr"),
        sum("s0").as("sr"))
      val w1 = cells.join(rowT, "we").crossJoin(broadcast(tots))
        .withColumn("target_r",
          col("fr").cast("double") * col("ss") / col("ff"))
        .withColumn("w1", col("s0") * col("target_r") / col("sr"))
      val colT = w1.groupBy("t").agg(sum("w1").as("w1c"),
        max(col("ss")).as("ss2"), max(col("ff")).as("ff2"))
      val colTarget = cells.groupBy("t").agg(sum("f").as("fc"))
      w1.join(colT, "t").join(colTarget, "t")
        .withColumn("target_c",
          col("fc").cast("double") * col("ss") / col("ff"))
        .select(col("we"), col("t").as("event_type"),
          col("s0").as("sample_count"),
          round(col("w1") * col("target_c") / col("w1c"), 4)
            .as("raked_count"))
        .orderBy("we", "event_type")
    }),

    // Post-stratified mean event value: strata = type, weights from
    // the full data, means from the %7 sample (milli grid).
    "q_post_strat" -> ((s, d) => {
      val base = Tables.events(s, d)
        .select(col("event_type").as("t"), col("event_id"),
          floor(col("value") * 1e3).cast("long").as("v"))
        .localCheckpoint(eager = true)
      val w = base.groupBy("t").agg(count(lit(1)).as("fn"))
      val smp = base.filter(col("event_id") % 7 === 0)
        .groupBy("t").agg(count(lit(1)).as("sn"), sum("v").as("sv"))
      val tru = base.agg(sum("v").as("tv"), count(lit(1)).as("tn"))
      val sTot = smp.agg(sum("sn").as("ssn"), sum("sv").as("ssv"))
      w.join(smp, "t")
        .agg(sum(col("fn").cast("double")
          * (col("sv").cast("double") / col("sn"))).as("wsum"),
          sum("fn").as("fsum"))
        .crossJoin(broadcast(tru)).crossJoin(broadcast(sTot))
        .select(col("fsum").as("n_population"),
          round(col("ssv").cast("double") / col("ssn") / 1000, 6)
            .as("raw_sample_mean"),
          round(col("wsum") / col("fsum") / 1000, 6)
            .as("post_stratified_mean"),
          round(col("tv").cast("double") / col("tn") / 1000, 6)
            .as("true_mean"))
    })
  )

  val oracle: Map[String, String] = Map(
    // identical π=1/17 expansion + FPC chain
    "q_ht_estimator" ->
      (s"WITH ${StatsR9ze.crCte}," +
      """
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, SUM(x) AS tx
        |        FROM cr),
        |smp AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM cr WHERE c % 17 = 0),
        |st AS (
        |  SELECT smp.n, tot.nn, smp.sx, tot.tx,
        |    (smp.n * CAST(smp.sxx AS DOUBLE)
        |      - CAST(smp.sx AS DOUBLE) * smp.sx)
        |      / (CAST(smp.n AS DOUBLE) * (smp.n - 1)) AS s2
        |  FROM smp, tot WHERE smp.n > 1)
        |SELECT n AS n_sample, nn AS n_population,
        |  ROUND(17.0 * sx / 100, 2) AS ht_total,
        |  ROUND(tx / 100.0, 2) AS true_total,
        |  ROUND(ABS(17.0 * sx - tx) / tx, 6) AS rel_err,
        |  ROUND(nn * sqrt((1.0 - CAST(n AS DOUBLE) / nn) * s2 / n)
        |    / 100, 2) AS se_fpc
        |FROM st""".stripMargin),

    // identical N_h·S_h weights
    "q_neyman_alloc" ->
      (s"WITH ${StatsR9ze.crCte}," +
      """
        |cg AS (
        |  SELECT cr.x, cu.c_nationkey AS nk
        |  FROM cr JOIN customer cu ON cr.c = cu.c_custkey),
        |st AS (
        |  SELECT nk, CAST(COUNT(*) AS BIGINT) AS nh, SUM(x) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM cg GROUP BY 1 HAVING COUNT(*) > 1),
        |wv AS (
        |  SELECT nk, nh,
        |    nh * sqrt((nh * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * sx)
        |      / (CAST(nh AS DOUBLE) * (nh - 1))) AS w
        |  FROM st),
        |tot AS (SELECT SUM(w) AS sw FROM wv)
        |SELECT wv.nk AS nationkey, wv.nh AS n_customers,
        |  ROUND(wv.w / tot.sw, 6) AS alloc_frac,
        |  CAST(ROUND(wv.w / tot.sw * 1000) AS BIGINT) AS alloc_n
        |FROM wv, tot ORDER BY nationkey""".stripMargin),

    // identical ANOVA ICC chain
    "q_design_effect" ->
      """WITH per AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(m) AS nn,
        |    SUM(y) AS sy, SUM(m * m) AS sm2,
        |    SUM(CAST(y AS DOUBLE) * y / m) AS ssb_part
        |  FROM per),
        |st AS (
        |  SELECT k, nn, sm2,
        |    (ssb_part - CAST(sy AS DOUBLE) * sy / nn) / (k - 1)
        |      AS msb,
        |    (CAST(sy AS DOUBLE) - ssb_part) / (nn - k) AS msw,
        |    (CAST(nn AS DOUBLE) - CAST(sm2 AS DOUBLE) / nn) / (k - 1)
        |      AS m0
        |  FROM ag)
        |SELECT k AS n_clusters, CAST(nn AS BIGINT) AS n_events,
        |  ROUND(m0, 6) AS m0,
        |  ROUND((msb - msw) / (msb + (m0 - 1) * msw), 6) AS icc,
        |  ROUND(1.0 + (m0 - 1) * ((msb - msw)
        |    / (msb + (m0 - 1) * msw)), 6) AS deff
        |FROM st WHERE msb + (m0 - 1) * msw > 0""".stripMargin,

    // identical modular captures
    "q_capture_recapture" ->
      (s"WITH ${StatsR9ze.crCte}," +
      """
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
        |    CAST(SUM(CASE WHEN c % 17 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN c % 13 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN c % 17 = 0 AND c % 13 = 0 THEN 1
        |      ELSE 0 END) AS BIGINT) AS m
        |  FROM cr)
        |SELECT n_true, n1, n2, m,
        |  ROUND(CAST(n1 AS DOUBLE) * n2 / m, 4) AS lincoln_petersen,
        |  ROUND(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 4)
        |    AS chapman,
        |  ROUND(ABS(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1
        |    - n_true) / n_true, 6) AS chapman_rel_err
        |FROM ag WHERE m > 0""".stripMargin),

    // identical one-step IPF
    "q_raking" ->
      """WITH base AS (
        |  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
        |      AS we,
        |    event_type AS t, event_id
        |  FROM events),
        |full_ AS (SELECT we, t, CAST(COUNT(*) AS BIGINT) AS f
        |          FROM base GROUP BY 1, 2),
        |smp AS (
        |  SELECT we, t, CAST(COUNT(*) AS BIGINT) AS s0
        |  FROM base WHERE event_id % 7 = 0 GROUP BY 1, 2),
        |cells AS (
        |  SELECT full_.we, full_.t, full_.f, smp.s0
        |  FROM full_ JOIN smp ON full_.we = smp.we
        |    AND full_.t = smp.t),
        |tots AS (SELECT SUM(f) AS ff, SUM(s0) AS ss FROM cells),
        |rowt AS (SELECT we, SUM(f) AS fr, SUM(s0) AS sr
        |         FROM cells GROUP BY 1),
        |w1 AS (
        |  SELECT cells.we, cells.t, cells.s0,
        |    cells.s0 * (rowt.fr * CAST(tots.ss AS DOUBLE) / tots.ff)
        |      / rowt.sr AS w1,
        |    tots.ss, tots.ff
        |  FROM cells JOIN rowt ON cells.we = rowt.we, tots),
        |colt AS (SELECT t, SUM(w1) AS w1c FROM w1 GROUP BY 1),
        |colf AS (SELECT t, SUM(f) AS fc FROM cells GROUP BY 1)
        |SELECT CAST(w1.we AS BIGINT) AS we, w1.t AS event_type,
        |  w1.s0 AS sample_count,
        |  ROUND(w1.w1 * (colf.fc * CAST(w1.ss AS DOUBLE) / w1.ff)
        |    / colt.w1c, 4) AS raked_count
        |FROM w1
        |JOIN colt ON w1.t = colt.t
        |JOIN colf ON w1.t = colf.t
        |ORDER BY w1.we, event_type""".stripMargin,

    // identical post-stratified chain
    "q_post_strat" ->
      """WITH base AS (
        |  SELECT event_type AS t, event_id,
        |    CAST(FLOOR(value * 1000) AS BIGINT) AS v
        |  FROM events),
        |w AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS fn
        |      FROM base GROUP BY 1),
        |smp AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS sn, SUM(v) AS sv
        |  FROM base WHERE event_id % 7 = 0 GROUP BY 1),
        |tru AS (SELECT SUM(v) AS tv, CAST(COUNT(*) AS BIGINT) AS tn
        |        FROM base),
        |stot AS (SELECT SUM(sn) AS ssn, SUM(sv) AS ssv FROM smp),
        |ag AS (
        |  SELECT SUM(CAST(w.fn AS DOUBLE)
        |      * (CAST(smp.sv AS DOUBLE) / smp.sn)) AS wsum,
        |    SUM(w.fn) AS fsum
        |  FROM w JOIN smp ON w.t = smp.t)
        |SELECT CAST(ag.fsum AS BIGINT) AS n_population,
        |  ROUND(CAST(stot.ssv AS DOUBLE) / stot.ssn / 1000, 6)
        |    AS raw_sample_mean,
        |  ROUND(ag.wsum / ag.fsum / 1000, 6)
        |    AS post_stratified_mean,
        |  ROUND(CAST(tru.tv AS DOUBLE) / tru.tn / 1000, 6)
        |    AS true_mean
        |FROM ag, tru, stot""".stripMargin
  )
}
