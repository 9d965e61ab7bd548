package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-10 wave 3 (SURVEY.md §2 B.10): data-valuation and
  * distribution-tail anomaly scoring over the embeddings table —
  * exact closed-form KNN-Shapley (the Jia et al. recursion cleared to
  * a 1e9-snapped suffix sum) and simplified ECOD outlier scores
  * (per-dimension tail ECDFs, log terms snapped to exact longs).
  * q_knn_shapley ranks the WHOLE candidate corpus, so (r10 VERDICT
  * task 1) its rank and suffix sum run through operators/PrefixSum —
  * two range-partitioned passes, no corpus-grain single-task window;
  * lead(u) is an equi-join on the rank. q_ecod_outlier's windows
  * partition by dimension (bounded fan-in per partition = corpus/dim
  * — at 100 TB the per-dim ECDF switches to approx quantile bins).
  */
object StatsR10c {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Exact KNN-Shapley data valuation (Jia et al. 2019) for the
    // vec_id=0 query at K=5: candidates ranked by ROUND(cos,6) DESC
    // (the house ranking grid), u_j = 1{label_j = label_0}; the
    // recursion φ_j = φ_{j+1} + (u_j − u_{j+1})/max(K,j) clears to a
    // SUFFIX SUM of exact longs via per-rank reciprocals snapped to
    // 1e9 — so the whole valuation is one window pass, no iteration.
    // Top-20 most valuable training points ship for review.
    "q_knn_shapley" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"), col("label").as("q_lbl"))
      val base = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"),
          when(col("label") === col("q_lbl"), 1L).otherwise(0L).as("u"))
      // global rank j over (cos DESC, vec_id): range-partitioned
      // two-pass rank — the corpus is never sorted in one task
      val idx = graft.operators.PrefixSum.rankAndCumSum(base,
          Seq(col("cos").desc, col("vec_id")), lit(0L), "j", "__c0")
        .drop("__c0")
      // lead(u) in rank order = equi-join on j+1 (distributed); the
      // one row with no successor is the LAST row, where j == n — so
      // the 1/n leave-one-out base term needs no global count at all
      val nxt = idx.select((col("j") - 1L).as("j"), col("u").as("u_next"))
      val terms = idx.join(nxt, Seq("j"), "left")
        .withColumn("term",
          when(col("u_next").isNull,
            col("u") * round(lit(1e9) / col("j")).cast("long"))
          .otherwise((col("u") - col("u_next"))
            * round(lit(1e9) / greatest(lit(5L), col("j"))).cast("long")))
      // suffix sum over ascending j == inclusive prefix over j DESC;
      // long addition is associative, so this is bit-identical to the
      // single-partition suffix window it replaces
      graft.operators.PrefixSum.rankAndCumSum(terms,
          Seq(col("j").desc), col("term"), "__r2", "phi_u")
        .select(col("vec_id"), col("j").as("knn_rank"),
          col("u").as("same_label"),
          round(col("phi_u") / 1e9, 6).as("shapley"))
        .orderBy(col("shapley").desc, col("vec_id"))
        .limit(20)
    }),

    // Simplified ECOD outlier score (Li et al. 2022): per dimension,
    // left tail = count(≤x)/n and right tail = count(≥x)/n via RANGE
    // windows (peer ties counted), O = Σ_d ln(n/count) with each log
    // term snapped to a 1e9 long — exact sums, one final division.
    // Score = max(left, right) aggregate; top-20 outliers ship.
    "q_ecod_outlier" -> ((s, d) => {
      val dims = Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("dim")))
      val wl = Window.partitionBy("dim").orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wr = Window.partitionBy("dim").orderBy(col("v").desc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      dims
        .withColumn("cle", count(lit(1)).over(wl))
        .withColumn("cge", count(lit(1)).over(wr))
        .withColumn("tl", expr("CAST(ROUND(LN(CAST(n AS DOUBLE) / cle)" +
          " * 1e9) AS BIGINT)"))
        .withColumn("tr", expr("CAST(ROUND(LN(CAST(n AS DOUBLE) / cge)" +
          " * 1e9) AS BIGINT)"))
        .groupBy("vec_id")
        .agg(sum("tl").as("ol_u"), sum("tr").as("or_u"))
        .select(col("vec_id"),
          round(col("ol_u") / 1e9, 4).as("o_left"),
          round(col("or_u") / 1e9, 4).as("o_right"),
          round(greatest(col("ol_u"), col("or_u")) / 1e9, 4)
            .as("o_max"))
        .orderBy(col("o_max").desc, col("vec_id"))
        .limit(20)
    })
  )

  val oracle: Map[String, String] = Map(
    // identical snapped suffix-sum recursion
    "q_knn_shapley" ->
      s"""WITH q AS (
        |  SELECT embedding AS q_emb, label AS q_lbl FROM embeddings
        |  WHERE vec_id = 0),
        |ranked AS (
        |  SELECT e.vec_id,
        |    ROUND(${LlmOps.duckCos("e.embedding", "q.q_emb")}, 6)
        |      AS cos,
        |    CASE WHEN e.label = q.q_lbl THEN 1 ELSE 0 END AS u
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
        |idx AS (
        |  SELECT vec_id, u,
        |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id)
        |      AS BIGINT) AS j,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM ranked),
        |terms AS (
        |  SELECT vec_id, j, u,
        |    CASE WHEN lead(u) OVER (ORDER BY j) IS NULL
        |      THEN u * CAST(ROUND(1e9 / n) AS BIGINT)
        |      ELSE (u - lead(u) OVER (ORDER BY j))
        |        * CAST(ROUND(1e9 / GREATEST(5, j)) AS BIGINT) END
        |      AS term
        |  FROM idx),
        |phi AS (
        |  SELECT vec_id, j, u,
        |    SUM(term) OVER (ORDER BY j
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS phi_u
        |  FROM terms)
        |SELECT vec_id, j AS knn_rank, CAST(u AS BIGINT) AS same_label,
        |  ROUND(phi_u / 1e9, 6) AS shapley
        |FROM phi ORDER BY shapley DESC, vec_id LIMIT 20""".stripMargin,

    // identical RANGE-window tail counts + snapped log terms
    "q_ecod_outlier" ->
      """WITH ex AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |dims AS (
        |  SELECT vec_id, dim, v,
        |    CAST(COUNT(*) OVER (PARTITION BY dim) AS BIGINT) AS n
        |  FROM ex),
        |tails AS (
        |  SELECT vec_id, n,
        |    CAST(COUNT(*) OVER (PARTITION BY dim ORDER BY v
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cle,
        |    CAST(COUNT(*) OVER (PARTITION BY dim ORDER BY v DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cge
        |  FROM dims),
        |terms AS (
        |  SELECT vec_id,
        |    CAST(ROUND(LN(CAST(n AS DOUBLE) / cle) * 1e9) AS BIGINT)
        |      AS tl,
        |    CAST(ROUND(LN(CAST(n AS DOUBLE) / cge) * 1e9) AS BIGINT)
        |      AS tr
        |  FROM tails)
        |SELECT vec_id,
        |  ROUND(SUM(tl) / 1e9, 4) AS o_left,
        |  ROUND(SUM(tr) / 1e9, 4) AS o_right,
        |  ROUND(GREATEST(SUM(tl), SUM(tr)) / 1e9, 4) AS o_max
        |FROM terms GROUP BY 1
        |ORDER BY o_max DESC, vec_id LIMIT 20""".stripMargin
  )
}
