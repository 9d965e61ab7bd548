package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-10 wave 22 (SURVEY.md §2 B.10b): variance inflation factors
  * (3-feature closed form), local outlier factor on the deterministic
  * sample, and 2-feature Mahalanobis outliers.
  *
  * House discipline: all correlations/covariances assemble from exact
  * long sums (milli value, props.k, hour-of-day); LOF runs entirely
  * inside the bounded 1-in-17 sample (the q_hubness sampling
  * posture); Mahalanobis inverts the 2×2 in closed form.
  */
object StatsR10u {

  /** (vm, k, hr) exact feature projection. */
  private def feats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        floor(col("value") * 1e3).cast("long").as("x"),
        expr("CAST(get_json_object(props, '$.k') AS LONG)").as("y"),
        hour(col("ts")).cast("long").as("z"))
      .filter(col("y").isNotNull)

  private val featsCte: String =
    """f AS (
      |  SELECT event_id,
      |    CAST(FLOOR(value * 1000) AS BIGINT) AS x,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS y,
      |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS z
      |  FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL)"""
      .stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Variance inflation factors for the 3-feature design (milli
    // value, props.k, hour): pairwise Pearson r from exact long sums,
    // R²_{j|rest} closed form, VIF_j = 1/(1−R²_j) — the collinearity
    // screen before anyone trusts regression coefficients.
    "q_vif3" -> ((s, d) => {
      feats(s, d).agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("z") * col("z")).as("szz"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("z")).as("sxz"),
          sum(col("y") * col("z")).as("syz"))
        .withColumn("r12", (col("n").cast("double") * col("sxy")
          - col("sx").cast("double") * col("sy"))
          / sqrt((col("n").cast("double") * col("sxx")
            - col("sx").cast("double") * col("sx"))
            * (col("n").cast("double") * col("syy")
              - col("sy").cast("double") * col("sy"))))
        .withColumn("r13", (col("n").cast("double") * col("sxz")
          - col("sx").cast("double") * col("sz"))
          / sqrt((col("n").cast("double") * col("sxx")
            - col("sx").cast("double") * col("sx"))
            * (col("n").cast("double") * col("szz")
              - col("sz").cast("double") * col("sz"))))
        .withColumn("r23", (col("n").cast("double") * col("syz")
          - col("sy").cast("double") * col("sz"))
          / sqrt((col("n").cast("double") * col("syy")
            - col("sy").cast("double") * col("sy"))
            * (col("n").cast("double") * col("szz")
              - col("sz").cast("double") * col("sz"))))
        .withColumn("r2_1", (col("r12") * col("r12")
          + col("r13") * col("r13")
          - lit(2.0) * col("r12") * col("r13") * col("r23"))
          / (lit(1.0) - col("r23") * col("r23")))
        .withColumn("r2_2", (col("r12") * col("r12")
          + col("r23") * col("r23")
          - lit(2.0) * col("r12") * col("r23") * col("r13"))
          / (lit(1.0) - col("r13") * col("r13")))
        .withColumn("r2_3", (col("r13") * col("r13")
          + col("r23") * col("r23")
          - lit(2.0) * col("r13") * col("r23") * col("r12"))
          / (lit(1.0) - col("r12") * col("r12")))
        .select(col("n"),
          round(col("r12"), 6).as("r_value_k"),
          round(col("r13"), 6).as("r_value_hour"),
          round(col("r23"), 6).as("r_k_hour"),
          round(lit(1.0) / (lit(1.0) - col("r2_1")), 4).as("vif_value"),
          round(lit(1.0) / (lit(1.0) - col("r2_2")), 4).as("vif_k"),
          round(lit(1.0) / (lit(1.0) - col("r2_3")), 4).as("vif_hour"))
    }),

    // Local outlier factor (k = 5) inside the 1-in-17 embedding
    // sample: cosine distance, k-dist, reachability, lrd, LOF — the
    // density-relative anomaly score, bounded to the deterministic
    // sample exactly like q_hubness; top 10 by LOF.
    "q_lof_sample" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val sEmb = Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(10)) === 0)
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(eager = true)
      val pairs = sEmb.select(col("vec_id").as("a"),
          col("embedding").as("ea"))
        .join(sEmb.select(col("vec_id").as("b"),
          col("embedding").as("eb")), col("a") =!= col("b"))
        .select(col("a"), col("b"),
          (lit(1.0) - expr("cosine_sim(ea, eb)")).as("dist"))
        .withColumn("rn", row_number().over(Window.partitionBy("a")
          .orderBy(col("dist"), col("b"))))
        .filter(col("rn") <= 5)
        .localCheckpoint(eager = true) // kdist leg + reach legs
      val kdist = pairs.filter(col("rn") === 5)
        .select(col("a").as("kb"), col("dist").as("kd"))
      val lrd = pairs
        .join(kdist.withColumnRenamed("kb", "b"), "b")
        .select(col("a"), greatest(col("kd"), col("dist")).as("reach"))
        .groupBy("a")
        .agg((lit(1.0) / avg("reach")).as("lrd"))
        .localCheckpoint(eager = true) // self + neighbor legs
      pairs.select(col("a"), col("b"))
        .join(lrd.withColumnRenamed("a", "b")
          .withColumnRenamed("lrd", "lrd_b"), "b")
        .groupBy("a").agg(avg("lrd_b").as("mean_lrd_nb"))
        .join(lrd, "a")
        .select(col("a").as("vec_id"),
          round(col("lrd"), 6).as("lrd"),
          round(col("mean_lrd_nb") / col("lrd"), 6).as("lof"))
        .orderBy(col("lof").desc, col("vec_id"))
        .limit(10)
    }),

    // 2-feature Mahalanobis outliers (milli value × props.k): the
    // 2×2 covariance inverts in closed form from exact long moments;
    // top 20 events by distance² — the correlated-feature outlier the
    // per-axis z-score misses.
    "q_mahalanobis2" -> ((s, d) => {
      val f = feats(s, d).localCheckpoint(eager = true) // moment + score
      val mom = f.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("mx", col("sx").cast("double") / col("n"))
        .withColumn("my", col("sy").cast("double") / col("n"))
        .withColumn("vx", (col("n").cast("double") * col("sxx")
          - col("sx").cast("double") * col("sx"))
          / col("n") / (col("n") - 1))
        .withColumn("vy", (col("n").cast("double") * col("syy")
          - col("sy").cast("double") * col("sy"))
          / col("n") / (col("n") - 1))
        .withColumn("cxy", (col("n").cast("double") * col("sxy")
          - col("sx").cast("double") * col("sy"))
          / col("n") / (col("n") - 1))
        .select("mx", "my", "vx", "vy", "cxy")
      f.crossJoin(broadcast(mom))
        .withColumn("dx", col("x") - col("mx"))
        .withColumn("dy", col("y") - col("my"))
        .withColumn("d2", (col("vy") * col("dx") * col("dx")
          + col("vx") * col("dy") * col("dy")
          - lit(2.0) * col("cxy") * col("dx") * col("dy"))
          / (col("vx") * col("vy") - col("cxy") * col("cxy")))
        .select(col("event_id"), round(col("d2"), 6).as("d2"))
        .orderBy(col("d2").desc, col("event_id"))
        .limit(20)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_vif3" ->
      s"""WITH $featsCte,
        |g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(z) AS BIGINT) AS sz,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(z * z) AS BIGINT) AS szz,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * z) AS BIGINT) AS sxz,
        |    CAST(SUM(y * z) AS BIGINT) AS syz
        |  FROM f),
        |r AS (
        |  SELECT n,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |      AS r12,
        |    (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
        |      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |        * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
        |      AS r13,
        |    (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
        |      / sqrt((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
        |        * (CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
        |      AS r23
        |  FROM g),
        |v AS (
        |  SELECT n, r12, r13, r23,
        |    (r12 * r12 + r13 * r13 - 2.0 * r12 * r13 * r23)
        |      / (1.0 - r23 * r23) AS r2_1,
        |    (r12 * r12 + r23 * r23 - 2.0 * r12 * r23 * r13)
        |      / (1.0 - r13 * r13) AS r2_2,
        |    (r13 * r13 + r23 * r23 - 2.0 * r13 * r23 * r12)
        |      / (1.0 - r12 * r12) AS r2_3
        |  FROM r)
        |SELECT n,
        |  ROUND(r12, 6) AS r_value_k,
        |  ROUND(r13, 6) AS r_value_hour,
        |  ROUND(r23, 6) AS r_k_hour,
        |  ROUND(1.0 / (1.0 - r2_1), 4) AS vif_value,
        |  ROUND(1.0 / (1.0 - r2_2), 4) AS vif_k,
        |  ROUND(1.0 / (1.0 - r2_3), 4) AS vif_hour
        |FROM v""".stripMargin,

    "q_lof_sample" -> {
      val dc = LlmOps.duckCos("a.embedding", "b.embedding")
      s"""WITH s AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 10 = 0),
        |pairs AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b, 1.0 - $dc AS dist
        |  FROM s a JOIN s b ON a.vec_id <> b.vec_id),
        |knn AS (
        |  SELECT a, b, dist FROM (
        |    SELECT a, b, dist, row_number() OVER (PARTITION BY a
        |      ORDER BY dist, b) AS rn
        |    FROM pairs) WHERE rn <= 5),
        |kd AS (
        |  SELECT a AS kb, MAX(dist) AS kd FROM knn GROUP BY 1),
        |lrd AS (
        |  SELECT knn.a, 1.0 / AVG(GREATEST(kd.kd, knn.dist)) AS lrd
        |  FROM knn JOIN kd ON knn.b = kd.kb GROUP BY 1),
        |lof AS (
        |  SELECT knn.a, AVG(lb.lrd) AS mean_lrd_nb
        |  FROM knn JOIN lrd lb ON knn.b = lb.a GROUP BY 1)
        |SELECT lof.a AS vec_id,
        |  ROUND(lrd.lrd, 6) AS lrd,
        |  ROUND(lof.mean_lrd_nb / lrd.lrd, 6) AS lof
        |FROM lof JOIN lrd ON lof.a = lrd.a
        |ORDER BY lof DESC, vec_id LIMIT 10""".stripMargin
    },

    "q_mahalanobis2" ->
      s"""WITH $featsCte,
        |g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM f),
        |m AS (
        |  SELECT CAST(sx AS DOUBLE) / n AS mx,
        |    CAST(sy AS DOUBLE) / n AS my,
        |    (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |      / n / (n - 1) AS vx,
        |    (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
        |      / n / (n - 1) AS vy,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / n / (n - 1) AS cxy
        |  FROM g),
        |sc AS (
        |  SELECT event_id,
        |    (vy * (x - mx) * (x - mx) + vx * (y - my) * (y - my)
        |      - 2.0 * cxy * (x - mx) * (y - my))
        |      / (vx * vy - cxy * cxy) AS d2
        |  FROM f, m)
        |SELECT event_id, ROUND(d2, 6) AS d2
        |FROM sc ORDER BY d2 DESC, event_id LIMIT 20""".stripMargin
  )
}
