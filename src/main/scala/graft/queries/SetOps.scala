package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** B.7 set operations (SURVEY.md §2).
  *
  * `union` is plan-level concatenation (no shuffle); the *_distinct /
  * intersect / except variants shuffle on the full row — at scale they
  * hash-partition on all columns, so keep projections narrow before
  * the set op (done here: key-only projections).
  */
object SetOps {

  private def ordersIn(s: SparkSession, d: String, from: String, until: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
              col("o_orderdate") < lit(until).cast("timestamp"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union_all" -> ((s, d) => {
      val a = ordersIn(s, d, "1996-01-01", "1996-03-01")
        .select(col("o_orderkey"), lit("q1").as("src"))
      val b = ordersIn(s, d, "1996-02-01", "1996-04-01")
        .select(col("o_orderkey"), lit("q2").as("src"))
      a.unionByName(b).orderBy("o_orderkey", "src")
    }),

    "q_union_distinct" -> ((s, d) => {
      val a = ordersIn(s, d, "1996-01-01", "1997-01-01").select("o_custkey")
      val b = ordersIn(s, d, "1997-01-01", "1998-01-01").select("o_custkey")
      a.union(b).distinct().orderBy("o_custkey")
    }),

    "q_intersect" -> ((s, d) => {
      val a = ordersIn(s, d, "1996-01-01", "1997-01-01").select("o_custkey")
      val b = ordersIn(s, d, "1997-01-01", "1998-01-01").select("o_custkey")
      a.intersect(b).orderBy("o_custkey")
    }),

    "q_except" -> ((s, d) => {
      val a = ordersIn(s, d, "1996-01-01", "1997-01-01").select("o_custkey")
      val b = ordersIn(s, d, "1997-01-01", "1998-01-01").select("o_custkey")
      a.except(b).orderBy("o_custkey")
    })
  )

  private val y96 = "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"
  private val y97 = "o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'"

  val oracle: Map[String, String] = Map(
    "q_union_all" ->
      """SELECT o_orderkey, 'q1' AS src FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-03-01'
        |UNION ALL
        |SELECT o_orderkey, 'q2' AS src FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |ORDER BY o_orderkey, src""".stripMargin,

    "q_union_distinct" ->
      s"""SELECT o_custkey FROM orders WHERE $y96
         |UNION
         |SELECT o_custkey FROM orders WHERE $y97
         |ORDER BY o_custkey""".stripMargin,

    "q_intersect" ->
      s"""SELECT o_custkey FROM orders WHERE $y96
         |INTERSECT
         |SELECT o_custkey FROM orders WHERE $y97
         |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      s"""SELECT o_custkey FROM orders WHERE $y96
         |EXCEPT
         |SELECT o_custkey FROM orders WHERE $y97
         |ORDER BY o_custkey""".stripMargin
  )
}
