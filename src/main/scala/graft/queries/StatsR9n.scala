package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.Registry
import graft.tables.Tables

/** Round-9 wave 14 (SURVEY.md §2 B.10b): ML-evaluation and
  * representation-learning ops — PR-AUC (group-end precision steps
  * snapped to 1e9), the ANN recall curve at k ∈ {1,5,10} (composes
  * the IVF and exact legs), simplified silhouette of the q_kmeans
  * assignment (post-hoc centroids, per-point score snapped to 1e6),
  * IPW average treatment effect over activity-decile propensity
  * strata (per-bin terms snapped to 1e9), TextRank keywords (4
  * pagerank rounds in EXACT integer state — div-based damping, no
  * float accumulation), and hard-negative mining for the query
  * vector. Exact integers to the last division.
  */
object StatsR9n {

  import LlmOps.duckCos

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // PR-AUC (average precision) for value-score → purchase, grouped
    // by distinct score like q_auc: descending-score groups, AP =
    // Σ pos_i·P_i/cumN_i / n_pos with each group term snapped to 1e9
    // before the exact sum (group-end precision convention, stated).
    "q_pr_auc" -> ((s, d) => {
      val perScore = Tables.events(s, d)
        .withColumn("is_pos",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
        .groupBy("value")
        .agg(count(lit(1)).as("n"), sum("is_pos").as("pos"))
      // bounded grain: distinct quantized score values (generator grid)
      val w = Window.orderBy(col("value").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      perScore
        .withColumn("cump", sum("pos").over(w))
        .withColumn("cumn", sum("n").over(w))
        .select(col("pos"), col("n"),
          round(col("pos").cast("double") * col("cump") * lit(1e9)
            / col("cumn")).cast("long").as("term_u"))
        .agg(sum("pos").as("n_pos"), (sum("n") - sum("pos")).as("n_neg"),
          sum("term_u").as("su"))
        .filter(col("n_pos") > 0)
        .select(col("n_pos"), col("n_neg"),
          round(col("su").cast("double") / (col("n_pos") * lit(1e9)), 6)
            .as("ap"))
    }),

    // ANN recall curve: recall@k of the IVF probe vs the exact scan
    // for k ∈ {1, 5, 10} — both legs are the existing derivations
    // re-ranked by their own (cos desc, vec_id) order.
    "q_recall_curve" -> ((s, d) => {
      // bounded grain: ranks the bounded top-k probe outputs
      val wr = Window.orderBy(col("cos").desc, col("vec_id"))
      val ivf = TextSim.queries("q_sim_ivf")(s, d)
        .withColumn("ri", row_number().over(wr).cast("long"))
      val exact = LlmOps.queries("q_sim_cosine_topk")(s, d)
        .withColumn("re", row_number().over(wr).cast("long"))
      import s.implicits._
      val kdf = Seq(1L, 5L, 10L).toDF("k")
      ivf.join(exact, "vec_id")
        .crossJoin(broadcast(kdf))
        .filter(col("ri") <= col("k") && col("re") <= col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_common"))
        .select(col("k"), col("n_common"),
          round(col("n_common").cast("double") / col("k"), 2)
            .as("recall_at_k"))
        .orderBy("k")
    }),

    // Simplified silhouette of the q_kmeans assignment: post-hoc mean
    // centroids per cluster, a = 1 − cos(x, own), b = 1 − max cos to
    // any OTHER centroid (6dp cosine grid, the kmeans convention),
    // s = (b−a)/max(a,b) snapped to 1e6 per point, exact per-cluster
    // mean.
    "q_silhouette_simple" -> ((s, d) => {
      Registry.ensure(s)
      val km = LlmOps.queries("q_kmeans")(s, d).select("vec_id", "cid")
        .localCheckpoint(eager = true) // assignment + centroid legs
      val pts = km.join(Tables.embeddings(s, d), "vec_id")
        .select(col("vec_id"), col("cid"), col("embedding"))
      val cents = pts
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cid", "dim").agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> CAST(p.m AS FLOAT))")
          .as("c"))
        .select(col("cid").as("ccid"), col("c"))
      val scored = pts.crossJoin(broadcast(cents))
        .withColumn("cos", round(expr("cosine_sim(embedding, c)"), 6))
        .groupBy("vec_id", "cid")
        .agg(max(when(col("cid") === col("ccid"), col("cos"))).as("co"),
          max(when(col("cid") =!= col("ccid"), col("cos"))).as("cx"))
        .withColumn("a", lit(1.0) - col("co"))
        .withColumn("b", lit(1.0) - col("cx"))
        .filter(greatest(col("a"), col("b")) > 0)
        .withColumn("s_u", round((col("b") - col("a")) * lit(1e6)
          / greatest(col("a"), col("b"))).cast("long"))
      scored.groupBy("cid")
        .agg(count(lit(1)).as("n_points"),
          round(sum("s_u").cast("double") / count(lit(1)) / 1e6, 6)
            .as("mean_silhouette"))
        .orderBy("cid")
    }),

    // IPW average treatment effect (treatment = click share ≥ 200
    // milli by exact integer division — every user has every type on
    // this corpus so "ever did X" is degenerate; outcome = purchase
    // share in exact milli; propensity strata = activity deciles by
    // ntile over (n_events, user_id)): per-bin n_b(Ȳ1/t − Ȳ0 sums)
    // snapped to 1e6, bins with 0 or all treated dropped (stated),
    // ATE = Σ/(1e6·N·1000) in share units.
    "q_ipw_ate" -> ((s, d) => {
      val users0 = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("ne"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("nc"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .withColumn("t", when(expr("nc * 1000 div ne") >= 200, 1L)
          .otherwise(0L))
        .withColumn("ym", expr("np * 1000 div ne"))
      // user-grain decile assignment → range-partitioned rank + the
      // closed-form standard NTILE (r10 VERDICT task 4)
      val ranked = graft.operators.PrefixSum.rank(users0,
        Seq(col("ne"), col("user_id")), "rn")
      val users = ranked
        .crossJoin(broadcast(ranked.agg(max("rn").as("nu"))))
        .withColumn("bin",
          expr(graft.operators.PrefixSum.ntileExpr("rn", "nu", 10)))
        .localCheckpoint(eager = true) // bins + total legs
      val bins = users.groupBy("bin")
        .agg(count(lit(1)).as("nb"), sum("t").as("tb"),
          sum(when(col("t") === 1, col("ym")).otherwise(0L)).as("y1"),
          sum(when(col("t") === 0, col("ym")).otherwise(0L)).as("y0"))
        .filter(col("tb") > 0 && col("tb") < col("nb"))
        .select(col("nb"),
          round(col("nb").cast("double")
            * (col("y1").cast("double") / col("tb")
              - col("y0").cast("double") / (col("nb") - col("tb")))
            * lit(1e6)).cast("long").as("term_u"))
      val tot = users.agg(count(lit(1)).as("n_users"))
      bins.agg(count(lit(1)).as("n_bins_used"), sum("term_u").as("su"))
        .crossJoin(broadcast(tot))
        .select(col("n_users"), col("n_bins_used"),
          round(col("su").cast("double")
            / (col("n_users") * lit(1e9)), 6).as("ate_ipw"))
    }),

    // TextRank keywords: unweighted adjacency graph over corpus
    // bigrams seen ≥ 3 times (w1 ≠ w2, canonical undirected edge —
    // stated), 4 pagerank rounds in EXACT integer 1e9 state:
    // base = 15e7 div |V|, next = base + (85·Σ pr div deg) div 100 —
    // integer division damping, no float accumulation anywhere.
    "q_textrank_keywords" -> ((s, d) => {
      Registry.ensure(s)
      val edges = Tables.documents(s, d)
        .select(split(col("text"), " ").as("toks"))
        .select(expr("ngrams(toks, 2)"))
        .select(split(col("ngram"), " ").as("p"))
        .select(least(col("p")(0), col("p")(1)).as("w1"),
          greatest(col("p")(0), col("p")(1)).as("w2"))
        .filter(col("w1") =!= col("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
        .select("w1", "w2")
        .localCheckpoint(eager = true)
      val sym = edges.union(edges.select(col("w2"), col("w1")))
        .toDF("src", "dst").localCheckpoint(eager = true)
      val deg = sym.groupBy("src").agg(count(lit(1)).as("dg"))
        .localCheckpoint(eager = true)
      val nv = deg.count()
      val base = 150000000L / nv
      var pr = deg.select(col("src").as("node"),
          lit(1000000000L / nv).as("pr_u"))
        .localCheckpoint(eager = true)
      for (_ <- 1 to 4) {
        pr = sym
          .join(pr.select(col("node").as("src"), col("pr_u")), "src")
          .join(deg, "src")
          .select(col("dst"), expr("pr_u div dg").as("contrib"))
          .groupBy(col("dst").as("node"))
          .agg(sum("contrib").as("sc"))
          .select(col("node"),
            (lit(base) + expr("sc * 85 div 100")).as("pr_u"))
          .localCheckpoint(eager = true)
      }
      pr.orderBy(col("pr_u").desc, col("node")).limit(20)
        .select(col("node").as("word"),
          round(col("pr_u") / 1e9, 6).as("score"))
    }),

    // Hard-negative mining for the query vector: top-10 by cosine
    // among vectors with a DIFFERENT label than the query — the
    // contrastive-training batch builder's other half.
    "q_hard_negatives" -> ((s, d) => {
      Registry.ensure(s)
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"), col("label").as("q_lab"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("label") =!= col("q_lab"))
        .select(col("vec_id"), col("label"),
          round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    })
  )

  val oracle: Map[String, String] = Map(
    // identical group-end precision snaps
    "q_pr_auc" ->
      """WITH ps AS (
        |  SELECT value, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS pos
        |  FROM events GROUP BY 1),
        |cw AS (
        |  SELECT pos, n,
        |    CAST(SUM(pos) OVER w AS BIGINT) AS cump,
        |    CAST(SUM(n) OVER w AS BIGINT) AS cumn
        |  FROM ps
        |  WINDOW w AS (ORDER BY value DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (
        |  SELECT pos, n,
        |    CAST(ROUND(CAST(pos AS DOUBLE) * cump * 1e9 / cumn)
        |      AS BIGINT) AS term_u
        |  FROM cw),
        |ag AS (
        |  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(n) - SUM(pos) AS BIGINT) AS n_neg,
        |    CAST(SUM(term_u) AS BIGINT) AS su
        |  FROM t)
        |SELECT n_pos, n_neg,
        |  ROUND(CAST(su AS DOUBLE) / (n_pos * 1e9), 6) AS ap
        |FROM ag WHERE n_pos > 0""".stripMargin,

    // both legs are the existing oracles, re-ranked identically
    "q_recall_curve" ->
      s"""WITH ivf0 AS (${TextSim.oracle("q_sim_ivf")}),
        |ex0 AS (${LlmOps.oracle("q_sim_cosine_topk")}),
        |ivf AS (
        |  SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC,
        |    vec_id) AS BIGINT) AS ri FROM ivf0),
        |ex AS (
        |  SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC,
        |    vec_id) AS BIGINT) AS re FROM ex0),
        |ks AS (SELECT unnest([1, 5, 10]) AS k)
        |SELECT CAST(ks.k AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_common,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / ks.k, 2) AS recall_at_k
        |FROM ivf JOIN ex ON ivf.vec_id = ex.vec_id
        |CROSS JOIN ks
        |WHERE ivf.ri <= ks.k AND ex.re <= ks.k
        |GROUP BY ks.k ORDER BY k""".stripMargin,

    // km leg = the q_kmeans oracle verbatim; identical post-hoc
    // centroids and snapped per-point scores
    "q_silhouette_simple" ->
      s"""WITH km AS (${LlmOps.oracle("q_kmeans")}),
        |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        |pts AS (
        |  SELECT km.vec_id, km.cid, e.embedding
        |  FROM km JOIN embeddings e ON km.vec_id = e.vec_id),
        |mc AS (
        |  SELECT cid, i, AVG(CAST(embedding[i] AS DOUBLE)) AS m
        |  FROM pts CROSS JOIN dims GROUP BY cid, i),
        |cc AS (
        |  SELECT cid AS ccid, list(CAST(m AS FLOAT) ORDER BY i) AS c
        |  FROM mc GROUP BY cid),
        |sc AS (
        |  SELECT pts.vec_id, pts.cid,
        |    MAX(CASE WHEN pts.cid = cc.ccid THEN
        |      ROUND(${duckCos("pts.embedding", "cc.c")}, 6) END) AS co,
        |    MAX(CASE WHEN pts.cid <> cc.ccid THEN
        |      ROUND(${duckCos("pts.embedding", "cc.c")}, 6) END) AS cx
        |  FROM pts CROSS JOIN cc
        |  GROUP BY 1, 2),
        |su AS (
        |  SELECT cid,
        |    CAST(ROUND(((1.0 - cx) - (1.0 - co)) * 1e6
        |      / GREATEST(1.0 - co, 1.0 - cx)) AS BIGINT) AS s_u
        |  FROM sc WHERE GREATEST(1.0 - co, 1.0 - cx) > 0)
        |SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  ROUND(CAST(SUM(s_u) AS BIGINT) * 1.0 / COUNT(*) / 1e6, 6)
        |    AS mean_silhouette
        |FROM su GROUP BY 1 ORDER BY cid""".stripMargin,

    // identical share-threshold treatment, milli outcome, decile
    // strata and snapped per-bin terms
    "q_ipw_ate" ->
      """WITH us AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ne,
        |    CASE WHEN SUM(CASE WHEN event_type = 'click' THEN 1
        |        ELSE 0 END) * 1000 // COUNT(*) >= 200
        |      THEN 1 ELSE 0 END AS t,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) * 1000 // COUNT(*) AS BIGINT) AS ym
        |  FROM events GROUP BY 1),
        |bn AS (
        |  SELECT *, ntile(10) OVER (ORDER BY ne, user_id) AS bin
        |  FROM us),
        |ag AS (
        |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
        |    CAST(SUM(t) AS BIGINT) AS tb,
        |    CAST(SUM(CASE WHEN t = 1 THEN ym ELSE 0 END) AS BIGINT)
        |      AS y1,
        |    CAST(SUM(CASE WHEN t = 0 THEN ym ELSE 0 END) AS BIGINT)
        |      AS y0
        |  FROM bn GROUP BY 1),
        |tm AS (
        |  SELECT nb,
        |    CAST(ROUND(CAST(nb AS DOUBLE)
        |      * (CAST(y1 AS DOUBLE) / tb
        |        - CAST(y0 AS DOUBLE) / (nb - tb)) * 1e6) AS BIGINT)
        |      AS term_u
        |  FROM ag WHERE tb > 0 AND tb < nb),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM us)
        |SELECT tt.n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_bins_used,
        |  ROUND(CAST(SUM(term_u) AS BIGINT) * 1.0
        |    / (tt.n_users * 1e9), 6) AS ate_ipw
        |FROM tm, tt GROUP BY tt.n_users""".stripMargin,

    // identical edge threshold and 4 integer pagerank rounds
    "q_textrank_keywords" -> {
      val iter = (1 to 4).map { t =>
        s"""p$t AS (
           |  SELECT nxt.node,
           |    (SELECT 150000000 // COUNT(*) FROM deg)
           |      + (SUM(nxt.contrib) * 85) // 100 AS pr_u
           |  FROM (
           |    SELECT sym.dst AS node, p${t - 1}.pr_u // deg.dg
           |      AS contrib
           |    FROM sym
           |    JOIN p${t - 1} ON sym.src = p${t - 1}.node
           |    JOIN deg ON deg.src = sym.src) nxt
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH bi AS (
        |  SELECT unnest(list_transform(generate_series(1, len(l) - 1),
        |    i -> CASE WHEN l[i] < l[i + 1]
        |      THEN struct_pack(w1 := l[i], w2 := l[i + 1])
        |      ELSE struct_pack(w1 := l[i + 1], w2 := l[i]) END)) AS p
        |  FROM (SELECT string_split(text, ' ') AS l FROM documents)),
        |ed AS (
        |  SELECT p.w1, p.w2 FROM bi
        |  WHERE p.w1 <> p.w2
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |sym AS MATERIALIZED (
        |  SELECT w1 AS src, w2 AS dst FROM ed
        |  UNION ALL SELECT w2, w1 FROM ed),
        |deg AS MATERIALIZED (
        |  SELECT src, CAST(COUNT(*) AS BIGINT) AS dg
        |  FROM sym GROUP BY 1),
        |p0 AS (
        |  SELECT src AS node,
        |    CAST(1000000000 // (SELECT COUNT(*) FROM deg) AS BIGINT)
        |      AS pr_u
        |  FROM deg),
        |$iter
        |SELECT node AS word,
        |  ROUND(CAST(pr_u AS BIGINT) / 1e9, 6) AS score
        |FROM p4 ORDER BY pr_u DESC, node LIMIT 20""".stripMargin
    },

    // identical different-label filter and 6dp cosine order
    "q_hard_negatives" ->
      s"""WITH q AS (
        |  SELECT embedding AS q_emb, label AS q_lab
        |  FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  ROUND(${duckCos("embedding", "q.q_emb")}, 6) AS cos
        |FROM embeddings, q
        |WHERE vec_id <> 0 AND label <> q.q_lab
        |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  )
}
