package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables

/** Subquery surface: scalar, IN, and correlated-scalar subqueries —
  * expressed in SQL (lifecycle Entry 3, SURVEY.md §3.2) so Catalyst's
  * subquery rewrite/decorrelation does the planning: the correlated
  * aggregate becomes a joined aggregate, never a per-row re-execution
  * (which is what makes these viable at scale).
  */
object Subqueries {

  private def withViews(s: SparkSession, d: String): Unit = {
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
    Tables.customer(s, d).createOrReplaceTempView("customer_sq")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sq")
    Tables.part(s, d).createOrReplaceTempView("part_sq")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // uncorrelated scalar subquery: orders above the global mean.
    "q_subquery_scalar" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT o_orderkey, ROUND(o_totalprice, 4) AS price
          |FROM orders_sq
          |WHERE o_totalprice > 3 * (SELECT AVG(o_totalprice) FROM orders_sq)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // IN subquery: customers who placed an urgent order.
    "q_subquery_in" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT c_custkey, c_name FROM customer_sq
          |WHERE c_custkey IN
          |  (SELECT o_custkey FROM orders_sq WHERE o_orderpriority = '1-URGENT')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // correlated scalar subquery (TPC-H Q17 shape): lineitems under
    // half their part's average quantity.
    "q_subquery_correlated" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT l.l_partkey, COUNT(*) AS n_small,
          |  ROUND(SUM(l.l_extendedprice), 4) AS small_revenue
          |FROM lineitem_sq l
          |WHERE l.l_quantity < (
          |  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem_sq l2
          |  WHERE l2.l_partkey = l.l_partkey)
          |GROUP BY l.l_partkey
          |ORDER BY l.l_partkey""".stripMargin)
    }),

    // correlated LATERAL subquery with per-row ORDER BY ... LIMIT
    // (top-2 orders per customer): Catalyst decorrelates the lateral
    // into a ranked window join — one shuffle on the correlation key,
    // never a per-customer re-execution. The lateral SPELLING matters
    // beyond q_win_rownum_topk's window form because it's the shape
    // SQL users actually write for top-k-per-group.
    "q_join_lateral" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey,
          |  ROUND(o.o_totalprice, 4) AS price
          |FROM customer_sq c,
          |LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_sq
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |ORDER BY c.c_custkey, price DESC, o.o_orderkey""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_subquery_scalar" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 4) AS price
        |FROM orders
        |WHERE o_totalprice > 3 * (SELECT AVG(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q_subquery_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_subquery_correlated" ->
      """SELECT l.l_partkey, COUNT(*) AS n_small,
        |  ROUND(SUM(l.l_extendedprice), 4) AS small_revenue
        |FROM lineitem l
        |WHERE l.l_quantity < (
        |  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l.l_partkey
        |ORDER BY l.l_partkey""".stripMargin,

    "q_join_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey,
        |  ROUND(o.o_totalprice, 4) AS price
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, price DESC, o.o_orderkey""".stripMargin
  )
}
