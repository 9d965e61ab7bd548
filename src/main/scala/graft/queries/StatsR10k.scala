package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-10 wave 12 (SURVEY.md §2 B.10): four training-data curation
  * operators — DSIR hashed-bigram importance weights, the embedding
  * hubness audit, Borda judge-panel rank aggregation, and
  * propensity-stratified ATT.
  *
  * House discipline: hashed features ride the portable md5→int
  * bucket (the q_feature_hash idiom); per-bucket log-ratios snap to
  * 1e9 and per-doc scores to 1e6 before any distributed mean; ranks
  * are competition ranks (tie-stable across engines); the hubness
  * k-occurrence moments are exact long sums.
  */
object StatsR10k {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // DSIR (Xie et al. 2023) data-selection importance weights:
    // hashed-bigram (B=256) target-vs-corpus Laplace log-ratios,
    // per-doc average resampling weight — the "make the web slice
    // look like the curated slice" knob. Target = src0. The 256-row
    // ratio table broadcasts; the heavy pass is one bigram explode.
    "q_dsir_weights" -> ((s, d) => {
      val bg = Tables.documents(s, d)
        .withColumn("l", split(col("text"), " "))
        .filter(size(col("l")) >= 2)
        .select(col("doc_id"), col("source"),
          explode(expr("transform(sequence(1, size(l) - 1)," +
            " i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"))
            .as("g"))
        .withColumn("b",
          conv(substring(md5(col("g")), 1, 4), 16, 10).cast("int") % 256)
        .localCheckpoint(eager = true) // ratio leg + per-doc leg
      val buckets = bg.groupBy("b")
        .agg(count(lit(1)).as("cs"),
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"))
      val tot = buckets.agg(sum("cs").as("ss"), sum("ct").as("tt"))
      val ratios = buckets.crossJoin(tot)
        .select(col("b"),
          round(log(((col("ct") + 1) / (col("tt") + 256).cast("double"))
            / ((col("cs") + 1) / (col("ss") + 256).cast("double"))) * 1e9)
            .cast("long").as("lr"))
      bg.join(broadcast(ratios), "b")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_g"), sum("lr").as("slr"))
        .withColumn("w_u",
          round(col("slr") / col("n_g") / 1e3).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("w_u").as("sw"),
          sum(when(col("w_u") > 0, 1L).otherwise(0L)).as("n_pos"))
        .select(col("source"), col("n_docs"),
          round(col("sw") / col("n_docs") / 1e6, 6).as("mean_dsir"),
          round(col("n_pos") / col("n_docs").cast("double"), 6)
            .as("pos_share"))
        .orderBy("source")
    }),

    // Embedding hubness audit (Radovanovic et al.): k-occurrence of
    // each corpus vector in the top-5 neighbor lists of the 10%
    // deterministic query sample — max, skewness (exact count
    // moments), and the share of 2x-over-expected hubs. High skew =
    // a few vectors dominate every ANN answer; the retrieval-quality
    // smell test. Scale path: the query SAMPLE bounds the pair count
    // (k-occ is a property of the neighbor distribution, estimable
    // from a sample); q_sim_ivf carries the bucketed join.
    "q_hubness" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val k = 5
      val e = Tables.embeddings(s, d)
      val q = e.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val edges = q.join(
          e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb")),
          col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          expr("cosine_sim(a_emb, b_emb)").as("cos"))
        .withColumn("rn", row_number().over(Window.partitionBy("a_id")
          .orderBy(col("cos").desc, col("b_id"))))
        .filter(col("rn") <= k)
      val kocc = e.select(col("vec_id").as("b_id"))
        .join(edges.groupBy("b_id").agg(count(lit(1)).as("c")),
          Seq("b_id"), "left")
        .select(coalesce(col("c"), lit(0L)).as("c"))
      val nq = q.count() // tiny deterministic sample count
      val nc = e.count()
      val thr = 2.0 * k * nq / nc
      kocc.agg(count(lit(1)).as("n"), sum("c").as("s1"),
          sum(col("c") * col("c")).as("s2"),
          sum(col("c") * col("c") * col("c")).as("s3"),
          max("c").as("mx"),
          sum(when(col("c").cast("double") > lit(thr), 1L)
            .otherwise(0L)).as("n_hub"))
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("m2", col("s2").cast("double") / col("n")
          - col("mean") * col("mean"))
        .withColumn("m3", col("s3").cast("double") / col("n")
          - lit(3.0) * col("mean") * (col("s2").cast("double") / col("n"))
          + lit(2.0) * col("mean") * col("mean") * col("mean"))
        .select(lit(nq).as("n_queries"), col("n").as("n_corpus"),
          col("mx").as("max_kocc"),
          round(col("m3") / pow(col("m2"), 1.5), 4).as("skew_kocc"),
          round(col("n_hub") / col("n").cast("double"), 6)
            .as("hub_share"))
    }),

    // Borda judge-panel rank aggregation: three deterministic quality
    // judges (length, type-token ratio, 1/top-token-dominance) each
    // rank every doc (competition ranks — tie-stable); Borda score =
    // sum of (N − rank). The LLM-eval panel-aggregation shape with
    // exact integer scoring; top 20.
    "q_borda_count" -> ((s, d) => {
      // r13 opt (guide §2.3/§2.4): the judge inputs are all PER-DOC
      // token stats — the old explode + groupBy(doc_id, w) shuffled
      // every distinct (doc, word) pair across the cluster only to
      // re-aggregate back to doc grain. All four stats compute
      // map-side: n_tok = size(l), n_dis = size(array_distinct(l)),
      // and the top-token count is a single aggregate() pass over the
      // sorted array (max run length) — byte-identical to
      // max(groupBy-count), zero corpus-grain shuffles.
      // Doc-grain competition ranks stay PrefixSum.competitionRank
      // (r10 VERDICT task 4 — no corpus-grain single-task window); the
      // frame feeds 3 rank joins + the count, so materialize once.
      // r14 opt: fan out the single-file scan (util.Par) — the per-doc
      // aggregate(sort_array(l)) pass otherwise runs on one core
      val m = graft.util.Par.fanOut(Tables.documents(s, d))
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), col("n_chars").as("nc"),
          size(col("l")).cast("long").as("n_tok"),
          size(array_distinct(col("l"))).cast("long").as("n_dis"),
          expr("""aggregate(sort_array(l),
              struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS mx),
              (acc, x) -> struct(x,
                IF(x = acc.prev, acc.run + 1L, 1L),
                greatest(acc.mx, IF(x = acc.prev, acc.run + 1L, 1L))),
              acc -> acc.mx)""").as("mx_tok"))
        .withColumn("k2", col("n_dis").cast("double") / col("n_tok"))
        .withColumn("k3", col("mx_tok").cast("double") / col("n_tok"))
        .localCheckpoint(eager = true)
      import graft.operators.PrefixSum.competitionRank
      val ranked = competitionRank(competitionRank(competitionRank(
          m, "nc", desc = true, "r1"),
          "k2", desc = true, "r2"),
          "k3", desc = false, "r3")
        .crossJoin(broadcast(m.agg(count(lit(1)).as("nn"))))
      ranked.select(col("doc_id"),
          (col("nn") * 3 - col("r1") - col("r2") - col("r3"))
            .as("borda"),
          col("r1"), col("r2"), col("r3"))
        .orderBy(col("borda").desc, col("doc_id"))
        .limit(20)
    }),

    // Propensity-stratified ATT: treatment = even user_id (the house
    // A/B split), outcome = milli value, strata = props.k quintile
    // bands (coarsened exact matching on the observed covariate).
    // ATT = sum over strata of (n1s/n1)(y1s − y0s) from exact milli
    // sums; the naive diff alongside quantifies the confounding the
    // stratification removed.
    "q_psm_strat" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(
          (pmod(col("user_id"), lit(2)) === 0).as("tr"),
          least(expr("CAST(get_json_object(props, '$.k') AS LONG) div 20"),
            lit(4L)).as("st"),
          floor(col("value") * 1e3).cast("long").as("vm"))
      val g = ev.groupBy("st")
        .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("n1s"),
          sum(when(col("tr"), col("vm")).otherwise(0L)).as("s1s"),
          sum(when(!col("tr"), 1L).otherwise(0L)).as("n0s"),
          sum(when(!col("tr"), col("vm")).otherwise(0L)).as("s0s"))
        .filter(col("n1s") > 0 && col("n0s") > 0)
      g.agg(count(lit(1)).as("n_strata"),
          sum("n1s").as("n1"), sum("n0s").as("n0"),
          sum(col("n1s") * (col("s1s") / col("n1s").cast("double")
            - col("s0s") / col("n0s").cast("double"))).as("att_num"),
          sum("s1s").as("s1"), sum("s0s").as("s0"))
        .select(col("n_strata"), col("n1").as("n_treat"),
          col("n0").as("n_ctrl"),
          round(col("att_num") / col("n1") / 1e3, 6).as("att"),
          round((col("s1") / col("n1").cast("double")
            - col("s0") / col("n0").cast("double")) / 1e3, 6)
            .as("naive_diff"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_dsir_weights" ->
      """WITH dd AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS l
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, len(l) - 1),
        |      i -> l[i] || ' ' || l[i + 1])) AS g
        |  FROM dd),
        |bgb AS (
        |  SELECT doc_id, source,
        |    CAST(CAST('0x' || substring(md5(g), 1, 4) AS INT) % 256
        |      AS INT) AS b
        |  FROM bg),
        |buckets AS (
        |  SELECT b, CAST(COUNT(*) AS BIGINT) AS cs,
        |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ct
        |  FROM bgb GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(cs) AS BIGINT) AS ss,
        |    CAST(SUM(ct) AS BIGINT) AS tt FROM buckets),
        |ratios AS (
        |  SELECT b,
        |    CAST(ROUND(ln(((ct + 1) / CAST(tt + 256 AS DOUBLE))
        |      / ((cs + 1) / CAST(ss + 256 AS DOUBLE))) * 1e9) AS BIGINT)
        |      AS lr
        |  FROM buckets, tot),
        |perdoc AS (
        |  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(lr) AS BIGINT) AS slr
        |  FROM bgb JOIN ratios USING (b) GROUP BY 1, 2),
        |snapped AS (
        |  SELECT source,
        |    CAST(ROUND(slr / n_g / 1e3) AS BIGINT) AS w_u
        |  FROM perdoc),
        |g AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(w_u) AS BIGINT) AS sw,
        |    CAST(SUM(CASE WHEN w_u > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos
        |  FROM snapped GROUP BY 1)
        |SELECT source, n_docs,
        |  ROUND(sw / n_docs / 1e6, 6) AS mean_dsir,
        |  ROUND(n_pos / CAST(n_docs AS DOUBLE), 6) AS pos_share
        |FROM g ORDER BY source""".stripMargin,

    "q_hubness" ->
      s"""WITH q AS (
        |  SELECT vec_id AS a_id, embedding AS a_emb FROM embeddings
        |  WHERE vec_id % 10 = 0),
        |edges AS (
        |  SELECT a_id, e.vec_id AS b_id,
        |    ${LlmOps.duckCos("a_emb", "e.embedding")} AS cos
        |  FROM q JOIN embeddings e ON e.vec_id <> a_id),
        |topk AS (
        |  SELECT b_id FROM (
        |    SELECT b_id, row_number() OVER (PARTITION BY a_id
        |      ORDER BY cos DESC, b_id) AS rn
        |    FROM edges) WHERE rn <= 5),
        |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_q FROM q),
        |kocc AS (
        |  SELECT COALESCE(c.c, 0) AS c
        |  FROM embeddings e LEFT JOIN (
        |    SELECT b_id, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM topk GROUP BY 1) c ON e.vec_id = c.b_id),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS s1,
        |    CAST(SUM(c * c) AS BIGINT) AS s2,
        |    CAST(SUM(c * c * c) AS BIGINT) AS s3,
        |    CAST(MAX(c) AS BIGINT) AS mx,
        |    CAST(SUM(CASE WHEN CAST(c AS DOUBLE) > 2.0 * 5 * n_q
        |      / (SELECT COUNT(*) FROM embeddings) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_hub
        |  FROM kocc, nq GROUP BY n_q),
        |m AS (
        |  SELECT n, mx, n_hub,
        |    CAST(s1 AS DOUBLE) / n AS mean,
        |    CAST(s2 AS DOUBLE) / n
        |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
        |      AS m2,
        |    CAST(s3 AS DOUBLE) / n
        |      - 3.0 * (CAST(s1 AS DOUBLE) / n)
        |        * (CAST(s2 AS DOUBLE) / n)
        |      + 2.0 * (CAST(s1 AS DOUBLE) / n)
        |        * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
        |      AS m3
        |  FROM agg)
        |SELECT (SELECT n_q FROM nq) AS n_queries, n AS n_corpus,
        |  mx AS max_kocc,
        |  ROUND(m3 / pow(m2, 1.5), 4) AS skew_kocc,
        |  ROUND(n_hub / CAST(n AS DOUBLE), 6) AS hub_share
        |FROM m""".stripMargin,

    "q_borda_count" ->
      """WITH tok AS (
        |  SELECT doc_id, n_chars,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT doc_id, w, COUNT(*) AS cw, MAX(n_chars) AS nc
        |  FROM tok GROUP BY 1, 2),
        |m AS (
        |  SELECT doc_id, MAX(nc) AS nc,
        |    CAST(SUM(cw) AS BIGINT) AS n_tok,
        |    CAST(COUNT(*) AS BIGINT) AS n_dis,
        |    CAST(MAX(cw) AS BIGINT) AS mx_tok
        |  FROM wc GROUP BY 1),
        |ranked AS (
        |  SELECT doc_id,
        |    CAST(rank() OVER (ORDER BY nc DESC) AS BIGINT) AS r1,
        |    CAST(rank() OVER (ORDER BY
        |      CAST(n_dis AS DOUBLE) / n_tok DESC) AS BIGINT) AS r2,
        |    CAST(rank() OVER (ORDER BY
        |      CAST(mx_tok AS DOUBLE) / n_tok ASC) AS BIGINT) AS r3,
        |    COUNT(*) OVER () AS nn
        |  FROM m)
        |SELECT doc_id, nn * 3 - r1 - r2 - r3 AS borda, r1, r2, r3
        |FROM ranked ORDER BY borda DESC, doc_id LIMIT 20""".stripMargin,

    "q_psm_strat" ->
      """WITH ev AS (
        |  SELECT user_id % 2 = 0 AS tr,
        |    LEAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
        |      // 20, 4) AS st,
        |    CAST(FLOOR(value * 1000) AS BIGINT) AS vm
        |  FROM events),
        |g AS (
        |  SELECT st,
        |    CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n1s,
        |    CAST(SUM(CASE WHEN tr THEN vm ELSE 0 END) AS BIGINT) AS s1s,
        |    CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0s,
        |    CAST(SUM(CASE WHEN NOT tr THEN vm ELSE 0 END) AS BIGINT)
        |      AS s0s
        |  FROM ev GROUP BY 1
        |  HAVING SUM(CASE WHEN tr THEN 1 ELSE 0 END) > 0
        |     AND SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) > 0),
        |f AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(n1s) AS BIGINT) AS n1,
        |    CAST(SUM(n0s) AS BIGINT) AS n0,
        |    SUM(n1s * (s1s / CAST(n1s AS DOUBLE)
        |      - s0s / CAST(n0s AS DOUBLE))) AS att_num,
        |    CAST(SUM(s1s) AS BIGINT) AS s1,
        |    CAST(SUM(s0s) AS BIGINT) AS s0
        |  FROM g)
        |SELECT n_strata, n1 AS n_treat, n0 AS n_ctrl,
        |  ROUND(att_num / n1 / 1e3, 6) AS att,
        |  ROUND((s1 / CAST(n1 AS DOUBLE) - s0 / CAST(n0 AS DOUBLE))
        |    / 1e3, 6) AS naive_diff
        |FROM f""".stripMargin
  )
}
