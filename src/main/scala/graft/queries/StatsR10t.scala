package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-10 wave 21 (SURVEY.md §2 B.10): budget-constrained training
  * data selection under a token budget — the knapsack-shaped "what do
  * I keep for this compute budget" decision, run through the
  * range-partitioned PrefixSum operator so the corpus-grain
  * cumulative sums survive 100 TB (NO single-partition window).
  */
object StatsR10t {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Prefix-greedy selection under a 10%-of-corpus token budget,
    // two rankings compared head-to-head: by quality (1e6-snapped
    // TTR) and by quality-per-token density. Cumulative token mass
    // via operators/PrefixSum (exact long prefix sums, bit-identical
    // to a global window at ANY partitioning); selected = the
    // inclusive prefix whose cum stays inside the budget.
    "q_budget_select" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), size(col("l")).cast("long").as("tok"),
          round(size(array_distinct(col("l"))) * lit(1e6)
            / size(col("l"))).cast("long").as("qu"))
        .withColumn("dens",
          expr("CAST(qu * 1000 div tok AS BIGINT)")) // exact density grid
        .localCheckpoint(eager = true) // two strategy legs + budget leg
      val budget = docs.agg(expr("sum(tok) div 10").as("b"))
      def strat(name: String, order: Seq[org.apache.spark.sql.Column]) =
        graft.operators.PrefixSum
          .rankAndCumSum(docs, order, col("tok"), "rn", "cum")
          .crossJoin(broadcast(budget))
          .filter(col("cum") <= col("b"))
          .agg(count(lit(1)).as("n_selected"),
            sum("tok").as("tokens_used"),
            sum("qu").as("quality_mass"), max("b").as("token_budget"))
          .select(lit(name).as("strategy"), col("token_budget"),
            col("n_selected"), col("tokens_used"),
            round(col("quality_mass") / col("n_selected") / 1e6, 6)
              .as("mean_quality"))
      strat("by_quality", Seq(col("qu").desc, col("doc_id")))
        .unionAll(strat("by_density",
          Seq(col("dens").desc, col("doc_id"))))
        .orderBy("strategy")
    })
  )

  val oracle: Map[String, String] = Map(
    // single-window twin — PrefixSum's exactness contract makes the
    // distributed prefix sums bit-identical to this global window
    "q_budget_select" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |    CAST(ROUND(len(list_distinct(string_split(text, ' ')))
        |      * 1e6 / len(string_split(text, ' '))) AS BIGINT) AS qu
        |  FROM documents),
        |dd AS (SELECT doc_id, tok, qu,
        |    CAST(qu * 1000 // tok AS BIGINT) AS dens
        |  FROM docs),
        |b AS (SELECT CAST(SUM(tok) // 10 AS BIGINT) AS b FROM dd),
        |cq AS (
        |  SELECT tok, qu,
        |    CAST(SUM(tok) OVER (ORDER BY qu DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM dd),
        |cd AS (
        |  SELECT tok, qu,
        |    CAST(SUM(tok) OVER (ORDER BY dens DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM dd),
        |s1 AS (
        |  SELECT 'by_quality' AS strategy, MAX(b.b) AS token_budget,
        |    CAST(COUNT(*) AS BIGINT) AS n_selected,
        |    CAST(SUM(tok) AS BIGINT) AS tokens_used,
        |    ROUND(SUM(qu) / COUNT(*) / 1e6, 6) AS mean_quality
        |  FROM cq, b WHERE cum <= b.b),
        |s2 AS (
        |  SELECT 'by_density' AS strategy, MAX(b.b) AS token_budget,
        |    CAST(COUNT(*) AS BIGINT) AS n_selected,
        |    CAST(SUM(tok) AS BIGINT) AS tokens_used,
        |    ROUND(SUM(qu) / COUNT(*) / 1e6, 6) AS mean_quality
        |  FROM cd, b WHERE cum <= b.b)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |ORDER BY strategy""".stripMargin
  )
}
