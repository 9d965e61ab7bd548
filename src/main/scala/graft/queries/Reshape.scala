package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Reshaping + ordered-collection + percentile aggregates: pivot,
  * unpivot (melt), collect_list/set to sorted arrays, exact
  * interpolated percentiles. Completes the relational surface beyond
  * SURVEY.md §2 B.4 (same partial+final aggregation posture).
  */
object Reshape {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // wide table: one row per orderpriority, one count column per
    // orderstatus (fixed value list => deterministic schema).
    "q_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
        // absent pivot cells are null in Spark but 0 in the
        // conditional-aggregation oracle
        .select(col("o_orderpriority"),
          coalesce(col("n_f"), lit(0L)).as("n_f"),
          coalesce(col("n_o"), lit(0L)).as("n_o"),
          coalesce(col("n_p"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")),

    // melt the pivot back to long form via stack().
    "q_unpivot" -> ((s, d) => {
      val wide = Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
      wide.select(col("o_orderpriority"),
          expr("stack(3, 'F', F, 'O', O, 'P', P) AS (o_orderstatus, n)"))
        .filter(col("n").isNotNull) // absent cells have no long-form row
        .orderBy("o_orderpriority", "o_orderstatus")
    }),

    // ordered collection aggregates (sorted => deterministic arrays);
    // the final projection serializes the list ('|'-joined) because
    // array-typed output columns crash the driver's comparator.
    "q_agg_collect" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          array_join(sort_array(collect_set("o_orderstatus")), "|").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // exact interpolated percentiles (Spark percentile() and DuckDB
    // quantile_cont share the definition).
    // Exact quantiles via the DISTRIBUTED plan (r6, §7.5 posture):
    // percentile()'s per-group full-value buffer is the
    // memory-unbounded shape — ExactQuantiles reproduces its linear
    // interpolation from a value-count stream + rank window instead.
    "q_percentiles" -> ((s, d) => {
      val qv = graft.operators.ExactQuantiles.byGroup(
        Tables.lineitem(s, d), Seq("l_returnflag"), "l_extendedprice",
        Seq(0.25, 0.5, 0.75, 0.99))
      qv.groupBy("l_returnflag")
        .agg(
          round(max(when(col("q") === 0.25, col("v"))), 4).as("p25"),
          round(max(when(col("q") === 0.5, col("v"))), 4).as("p50"),
          round(max(when(col("q") === 0.75, col("v"))), 4).as("p75"),
          round(max(when(col("q") === 0.99, col("v"))), 4).as("p99"))
        .orderBy("l_returnflag")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_agg_collect" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|') AS statuses,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
