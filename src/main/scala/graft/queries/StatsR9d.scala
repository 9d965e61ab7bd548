package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 4 (SURVEY.md §2 B.10b): corpus-comparison and
  * user-behavior keys — pairwise source KL divergence, lexical
  * density, heavy-user CF neighbors, session-entropy histogram.
  * Bounded grids throughout: the KL grid is sources×sources×top-K
  * vocabulary, the CF pair space is a fixed top-50 cut, the entropy
  * histogram is O(buckets). Exact counts until the ln/√ step, 1e6/1e9
  * snaps before any distributed double sum.
  */
object StatsR9d {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Pairwise Jeffreys divergence (symmetric KL) between source
    // unigram distributions with add-1 smoothing over the TOP-30
    // global tokens (count desc, token asc — a deterministic cut that
    // bounds the grid at 100 TB where the tail vocabulary is
    // unbounded): the grid is sources² × 30, each term snaps to 1e12
    // before the sum. Smoothing makes every cell positive, so ln is
    // total.
    "q_kl_sources" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("t"))
      val top = toks.groupBy("t").agg(count(lit(1)).as("gc"))
        .orderBy(col("gc").desc, col("t")).limit(30)
        .select(col("t"))
      val cnt = toks.join(broadcast(top), "t")
        .groupBy("source", "t").agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy("source").agg(sum("c").as("n"))
      val grid = tot.select(col("source"), col("n"))
        .crossJoin(broadcast(top))
        .join(cnt, Seq("source", "t"), "left")
        .select(col("source"), col("t"),
          (coalesce(col("c"), lit(0L)) + 1).as("cs"), (col("n") + 30).as("ns"))
        .localCheckpoint(eager = true) // bounded sources×30 grid, 2 legs
      val b = grid.select(col("source").as("s2"), col("t").as("t2"),
        col("cs").as("cs2"), col("ns").as("ns2"))
      grid.join(b, col("t") === col("t2") && col("source") < col("s2"))
        .withColumn("p1", col("cs").cast("double") / col("ns"))
        .withColumn("p2", col("cs2").cast("double") / col("ns2"))
        .withColumn("term_u",
          round(((col("p1") - col("p2")) * log(col("p1") / col("p2")))
            * 1e12).cast("long"))
        .groupBy(col("source").as("source_a"), col("s2").as("source_b"))
        .agg(round(sum("term_u") / 1e12, 6).as("jeffreys_div"))
        .orderBy("source_a", "source_b")
    }),

    // Lexical density per language: content tokens (not in the fixed
    // stop list) over total, per-doc ratio snapped to 1e6 then
    // averaged — one linear pass, per-lang partial agg.
    "q_lexical_density" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("l", split(col("text"), " "))
        .withColumn("n_tok", size(col("l")).cast("long"))
        .withColumn("n_stop", size(filter(col("l"),
          t => t.isin("the", "a", "of", "and", "in"))).cast("long"))
        .withColumn("dens_u", expr(
          "CAST(ROUND((n_tok - n_stop) * 1e6 / n_tok) AS BIGINT)"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("dens_u") / 1e6), 6).as("avg_density"),
          round(min("dens_u") / 1e6, 6).as("min_density"))
        .orderBy("lang")),

    // Heavy-user collaborative-filtering neighbors: the top-50 users
    // by activity (count desc, user_id asc — a fixed deterministic
    // cut, so the pair space is 50² at ANY corpus size), 5-dim
    // event-type count vectors, cosine from exact long moments
    // snapped to 1e6, top-3 neighbors each by (cos desc, id).
    "q_cf_user_topk" -> ((s, d) => {
      val vec = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("v1"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v2"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("v3"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("v4"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("v5"))
        // top-50 cut as orderBy+limit → TakeOrderedAndProject (a
        // per-partition top-50 + merge, never a global sort; r10
        // VERDICT task 4 — replaces the corpus-grain rank window)
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(50)
        .withColumn("nrm", col("v1") * col("v1") + col("v2") * col("v2")
          + col("v3") * col("v3") + col("v4") * col("v4")
          + col("v5") * col("v5"))
        .localCheckpoint(eager = true) // bounded 50-row cut, 2 legs
      val b = vec.select(col("user_id").as("nbr_id"), col("v1").as("w1"),
        col("v2").as("w2"), col("v3").as("w3"), col("v4").as("w4"),
        col("v5").as("w5"), col("nrm").as("nrm2"))
      val wr = Window.partitionBy("user_id")
        .orderBy(col("cos_u").desc, col("nbr_id"))
      vec.join(b, col("user_id") =!= col("nbr_id"))
        .withColumn("dot", col("v1") * col("w1") + col("v2") * col("w2")
          + col("v3") * col("w3") + col("v4") * col("w4")
          + col("v5") * col("w5"))
        .withColumn("cos_u", round(col("dot") * 1e6
          / sqrt(col("nrm").cast("double") * col("nrm2"))).cast("long"))
        .withColumn("rank", row_number().over(wr).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("user_id"), col("rank"), col("nbr_id"),
          round(col("cos_u") / 1e6, 6).as("cos_sim"))
        .orderBy("user_id", "rank")
    }),

    // Session-entropy histogram: per-user event-type entropy via the
    // exact-count formulation H = ln(n) − Σc·ln(c)/n, snapped to 1e9;
    // the corpus rolls up to O(buckets) rows by integer division of
    // the SNAPPED value (exact long div — no double boundary).
    "q_session_entropy" -> ((s, d) => {
      val h = Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum("c").as("n"),
          sum(col("c").cast("double") * log(col("c"))).as("clnc"))
        .withColumn("h_u", round((log(col("n"))
          - col("clnc") / col("n")) * 1e9).cast("long"))
      h.withColumn("bucket", expr("h_u div 250000000"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_users"),
          round(sum("h_u") / count(lit(1)) / 1e9, 6).as("avg_entropy"))
        .orderBy("bucket")
    })
  )

  val oracle: Map[String, String] = Map(
    // identical top-30 cut, add-1 smoothing, 1e12 term snap
    "q_kl_sources" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |top AS (
        |  SELECT t FROM (SELECT t, COUNT(*) AS gc FROM toks GROUP BY 1)
        |  ORDER BY gc DESC, t LIMIT 30),
        |cnt AS (
        |  SELECT source, toks.t, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks JOIN top ON toks.t = top.t GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
        |        FROM cnt GROUP BY 1),
        |grid AS (
        |  SELECT tot.source, top.t,
        |    COALESCE(cnt.c, 0) + 1 AS cs, tot.n + 30 AS ns
        |  FROM tot CROSS JOIN top
        |  LEFT JOIN cnt ON cnt.source = tot.source AND cnt.t = top.t),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(ROUND(((CAST(a.cs AS DOUBLE) / a.ns
        |        - CAST(b.cs AS DOUBLE) / b.ns)
        |      * ln((CAST(a.cs AS DOUBLE) / a.ns)
        |        / (CAST(b.cs AS DOUBLE) / b.ns))) * 1e12) AS BIGINT)
        |      AS term_u
        |  FROM grid a JOIN grid b ON a.t = b.t AND a.source < b.source)
        |SELECT source_a, source_b,
        |  ROUND(SUM(term_u) / 1e12, 6) AS jeffreys_div
        |FROM pairs GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    // identical stop list and 1e6 per-doc snap
    "q_lexical_density" ->
      """WITH dd AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT lang,
        |    CAST(ROUND((n_tok - n_stop) * 1e6 / n_tok) AS BIGINT)
        |      AS dens_u
        |  FROM dd)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  ROUND(AVG(dens_u / 1e6), 6) AS avg_density,
        |  ROUND(MIN(dens_u) / 1e6, 6) AS min_density
        |FROM r GROUP BY 1 ORDER BY lang""".stripMargin,

    // identical top-50 cut and exact-moment cosine
    "q_cf_user_topk" ->
      """WITH vec AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v2,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v3,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v4,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v5
        |  FROM events GROUP BY 1),
        |cut AS (
        |  SELECT *, v1*v1 + v2*v2 + v3*v3 + v4*v4 + v5*v5 AS nrm
        |  FROM (SELECT *, row_number() OVER (ORDER BY cnt DESC, user_id)
        |          AS rk
        |        FROM vec)
        |  WHERE rk <= 50),
        |p AS (
        |  SELECT a.user_id, b.user_id AS nbr_id,
        |    CAST(ROUND((a.v1*b.v1 + a.v2*b.v2 + a.v3*b.v3 + a.v4*b.v4
        |        + a.v5*b.v5) * 1e6
        |      / sqrt(CAST(a.nrm AS DOUBLE) * b.nrm)) AS BIGINT) AS cos_u
        |  FROM cut a JOIN cut b ON a.user_id <> b.user_id),
        |r AS (
        |  SELECT user_id, nbr_id, cos_u,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY cos_u DESC, nbr_id) AS BIGINT) AS rank
        |  FROM p)
        |SELECT user_id, rank, nbr_id, ROUND(cos_u / 1e6, 6) AS cos_sim
        |FROM r WHERE rank <= 3 ORDER BY user_id, rank""".stripMargin,

    // identical 1e9 snap and exact integer-div bucketing
    "q_session_entropy" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |h AS (
        |  SELECT user_id,
        |    CAST(ROUND((ln(SUM(c)) - SUM(CAST(c AS DOUBLE) * ln(c))
        |      / SUM(c)) * 1e9) AS BIGINT) AS h_u
        |  FROM c GROUP BY 1)
        |SELECT h_u // 250000000 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  ROUND(SUM(h_u) / COUNT(*) / 1e9, 6) AS avg_entropy
        |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
