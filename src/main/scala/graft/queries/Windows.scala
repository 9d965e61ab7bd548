package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** B.5 window functions + B.6 sort/limit/top-k (SURVEY.md §2).
  *
  * Every window ORDER BY carries a unique tiebreaker (doubles tie), so
  * rank/lag/frame results are deterministic across engines. Partition
  * keys (orderpriority, custkey, user_id, orderstatus) are the shuffle
  * keys — at scale each partition's state is bounded by that key's
  * cardinality slice, never the whole table. The global top-k uses
  * orderBy+limit which Spark plans as TakeOrderedAndProject
  * (per-partition top-k then merge — no full sort at scale).
  */
object Windows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rnk") <= 10)
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    }),

    // planned as the sort-free TopKPerGroupExec via RewriteWindowTopK
    // (plans/TopK.scala; pinned in TopKSpec)
    "q_win_rownum_topk" -> ((s, d) => {
      graft.expr.Registry.ensure(s)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    "q_win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          lag("value", 1).over(w).as("prev_val"),
          lead("value", 1).over(w).as("next_val"))
        .withColumn("delta", col("value") - col("prev_val"))
        .orderBy("user_id", "event_id")
    }),

    "q_win_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(sum("o_totalprice").over(w), 4).as("run_sum"),
          // sum/count/scale spelled out identically on both sides:
          // 2dp money / small counts lands exactly on 4dp .5 boundaries,
          // where Spark (exact decimal expansion) and DuckDB (scaled
          // multiply) disagree. round(x*1e4)/1e4 makes both engines
          // round the same IEEE double half-away-from-zero.
          (round((sum("o_totalprice").over(w) / count(lit(1)).over(w)) * 1e4, 0) / 1e4).as("run_avg"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, 1000L)
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_near"))
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }),

    // DELIBERATE single-partition window (pinned in PlanAssertionsSpec):
    // ntile/percent_rank/cume_dist are global-quantile semantics, and
    // Spark executes an un-partitioned window as one task — correct,
    // and acceptable only because the input is one bounded dimension
    // table. The 100 TB formulations of the same semantics are
    // q_percentiles (exact percentile agg) / q_agg_approx_distinct-style
    // sketches, or a two-phase rank (range-repartition + per-range rank
    // + broadcast prefix counts); a fact-table quantile query here
    // would be a bug, not a style choice.
    "q_win_ntile_cume" -> ((s, d) => {
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("c_custkey")
    }),

    "q_win_first_last" -> ((s, d) => {
      // l_extendedprice tiebreak: (l_orderkey, l_linenumber) has
      // duplicates, so frame order needs it to be deterministic.
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          first("l_extendedprice").over(w).as("fv"),
          last("l_extendedprice").over(w).as("lv"),
          nth_value(col("l_extendedprice"), 2).over(w).as("nv2"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // B.6 ---------------------------------------------------------------
    "q_topk_global" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(50)),

    "q_sort_multi" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("st"),
          when(col("o_orderpriority") === "5-LOW", lit(null).cast("string"))
            .otherwise(col("o_orderpriority")).as("pri"),
          col("o_totalprice"))
        .orderBy(col("st").asc_nulls_first, col("pri").desc_nulls_last,
                 col("o_totalprice").desc, col("o_orderkey"))
        .limit(200))
  )

  val oracle: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(rank() OVER w AS INT) AS rnk,
        |    CAST(dense_rank() OVER w AS INT) AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rnk <= 10
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,

    "q_win_rownum_topk" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_win_lag_lead" ->
      """SELECT user_id, event_id, value, prev_val, next_val,
        |  value - prev_val AS delta
        |FROM (
        |  SELECT user_id, event_id, value,
        |    lag(value) OVER w AS prev_val,
        |    lead(value) OVER w AS next_val
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |ORDER BY user_id, event_id""".stripMargin,

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  ROUND(SUM(o_totalprice) OVER w, 4) AS run_sum,
        |  ROUND(SUM(o_totalprice) OVER w / COUNT(*) OVER w * 10000.0) / 10000.0 AS run_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_range_frame" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |                 RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near
        |FROM orders
        |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin,

    "q_win_ntile_cume" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
        |  ROUND(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_win_first_last" ->
      """SELECT l_orderkey, l_linenumber,
        |  first_value(l_extendedprice) OVER w AS fv,
        |  last_value(l_extendedprice) OVER w AS lv,
        |  nth_value(l_extendedprice, 2) OVER w AS nv2
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 50""".stripMargin,

    "q_sort_multi" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS st,
        |  CASE WHEN o_orderpriority = '5-LOW' THEN NULL ELSE o_orderpriority END AS pri,
        |  o_totalprice
        |FROM orders
        |ORDER BY st ASC NULLS FIRST, pri DESC NULLS LAST,
        |         o_totalprice DESC, o_orderkey
        |LIMIT 200""".stripMargin
  )
}
