package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Round-9 wave 17 (SURVEY.md §2 B.10b): supply-chain and
  * order-book analytics over the TPC-H tables — lead-time
  * percentiles (×20-cleared interpolation), customer segment
  * migration between order-date halves (tercile transition matrix),
  * per-ship-mode fill rate with exact slack days, discount-band
  * economics in exact 1e-4-dollar units, never-ordered part shares,
  * and largest-remainder (Hare) slot allocation — the exact integer
  * apportionment a shard/mix builder runs. Exact to the last
  * division throughout.
  */
object StatsR9q {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // Lead time order→ship per order priority: day counts are exact
    // ints; p50/p90 by the ×20-cleared interpolation (pos20 div/mod,
    // val20 = x_l(20−f)+x_u·f stays a long), mean from the exact sum.
    "q_lead_time" -> ((s, d) => {
      val j = Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .select("o_orderkey", "o_orderpriority", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lead"))
      val wr = Window.partitionBy("o_orderpriority")
        .orderBy("lead")
      val ranked = j
        .withColumn("rn", row_number().over(
          wr.orderBy("lead")).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("o_orderpriority")))
      def interp(m20: Int) =
        (sum(when(col("rn") === expr(s"((n - 1) * $m20) div 20") + 1,
          col("lead")).otherwise(0L))
          * (lit(20) - max((col("n") - 1) * m20 % 20))
          + sum(when(col("rn") === expr(s"((n - 1) * $m20) div 20") + 2,
            col("lead")).otherwise(0L))
            * max((col("n") - 1) * m20 % 20))
      ranked.groupBy("o_orderpriority")
        .agg(max("n").as("n_lines"), sum("lead").as("sl"),
          interp(10).as("v50"), interp(18).as("v90"))
        .select(col("o_orderpriority"), col("n_lines"),
          round(col("v50") / 20.0, 2).as("p50_days"),
          round(col("v90") / 20.0, 2).as("p90_days"),
          round(col("sl").cast("double") / col("n_lines"), 4)
            .as("mean_days"))
        .orderBy("o_orderpriority")
    }),

    // Customer segment migration between order-date halves (< 1996
    // vs ≥ 1996, stated): activity terciles per half by ntile over
    // (n_orders, custkey); the bounded 3×3 transition matrix with
    // row shares.
    "q_segment_migration" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("half",
          when(col("o_orderdate") < lit("1996-01-01").cast("date"),
            "h1").otherwise("h2"))
        .groupBy("o_custkey", "half").agg(count(lit(1)).as("n"))
        .withColumn("seg", ntile(3).over(
          Window.partitionBy("half").orderBy("n", "o_custkey")))
      val h1 = o.filter(col("half") === "h1")
        .select(col("o_custkey"), col("seg").as("seg_h1"))
      val h2 = o.filter(col("half") === "h2")
        .select(col("o_custkey"), col("seg").as("seg_h2"))
      val m = h1.join(h2, "o_custkey")
        .groupBy("seg_h1", "seg_h2").agg(count(lit(1)).as("n"))
      val rt = m.groupBy("seg_h1").agg(sum("n").as("row_n"))
      m.join(broadcast(rt), "seg_h1")
        .select(col("seg_h1").cast("long").as("seg_h1"),
          col("seg_h2").cast("long").as("seg_h2"), col("n"),
          round(col("n").cast("double") / col("row_n"), 4).as("share"))
        .orderBy("seg_h1", "seg_h2")
    }),

    // Fill rate per ship mode: the driver's lineitem ships no
    // shipmode/commit/receipt columns, so they are SYNTHESIZED by
    // deterministic integer formulas of (orderkey, linenumber) — the
    // derived-partsupp precedent (SURVEY B.11 synthesized-input
    // move): mode = MODES[(ok+ln) % 5], commit = ship + ok%10 + 5,
    // receipt = ship + (ok+ln)%14 + 1. On-time = receipt ≤ commit,
    // slack in exact day ints.
    "q_fill_rate" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("l_shipmode", element_at(
          array(lit("AIR"), lit("MAIL"), lit("RAIL"), lit("SHIP"),
            lit("TRUCK")),
          ((col("l_orderkey") + col("l_linenumber")) % 5 + 1)
            .cast("int")))
        .withColumn("l_commitdate",
          date_add(col("l_shipdate"),
            (col("l_orderkey") % 10 + 5).cast("int")))
        .withColumn("l_receiptdate",
          date_add(col("l_shipdate"),
            ((col("l_orderkey") + col("l_linenumber")) % 14 + 1)
              .cast("int")))
        .select(col("l_shipmode"),
          when(col("l_receiptdate") <= col("l_commitdate"), 1L)
            .otherwise(0L).as("ontime"),
          datediff(col("l_commitdate"), col("l_receiptdate"))
            .cast("long").as("slack"))
        .groupBy("l_shipmode")
        .agg(count(lit(1)).as("n_lines"), sum("ontime").as("n_ontime"),
          sum("slack").as("ss"))
        .select(col("l_shipmode"), col("n_lines"), col("n_ontime"),
          round(col("n_ontime").cast("double") / col("n_lines"), 6)
            .as("fill_rate"),
          round(col("ss").cast("double") / col("n_lines"), 4)
            .as("avg_slack_days"))
        .orderBy("l_shipmode")
    }),

    // Discount-band economics: band = discount in exact centi-%
    // (0..10); quantities integral, net revenue in exact 1e-4-dollar
    // units (cents × (100 − disc_c)) — the io_roundtrip money rule.
    "q_discount_bands" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(round(col("l_discount") * 100).cast("long").as("band"),
          col("l_quantity"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("net_u"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_lines"),
          round(sum("l_quantity").cast("double") / count(lit(1)), 4)
            .as("avg_qty"),
          round(sum("net_u") / 1e4 / 100, 2).as("net_revenue"))
        .orderBy("band")
    }),

    // Never-ordered parts per brand: ANTI join against lineitem,
    // share of the brand's catalog — the cold-start coverage read.
    "q_never_ordered" -> ((s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_brand")
        .localCheckpoint(eager = true) // total + anti legs
      val never = p.join(Tables.lineitem(s, d)
          .select(col("l_partkey").as("p_partkey")).distinct(),
        Seq("p_partkey"), "left_anti")
        .groupBy("p_brand").agg(count(lit(1)).as("n_never"))
      p.groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
        .join(never, Seq("p_brand"), "left")
        .select(col("p_brand"), col("n_parts"),
          coalesce(col("n_never"), lit(0L)).as("n_never"),
          round(coalesce(col("n_never"), lit(0L)).cast("double")
            / col("n_parts"), 4).as("share_never"))
        .orderBy("p_brand")
    }),

    // Largest-remainder (Hare) allocation of 100 mix slots across
    // sources by doc count: base = (n_s·100) div N, the 100 − Σbase
    // leftovers go to the largest remainders (ties → source asc,
    // stated) — EXACT integer apportionment, zero divisions.
    "q_largest_remainder" -> ((s, d) => {
      val src = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("nd"))
        .localCheckpoint(eager = true) // 2 legs
      val tot = src.agg(sum("nd").as("nn"))
      val quo = src.crossJoin(broadcast(tot))
        .withColumn("base", expr("(nd * 100) div nn"))
        .withColumn("rem", expr("(nd * 100) % nn"))
      val sb = quo.agg(sum("base").as("sb"))
      val ranked = quo.crossJoin(broadcast(sb))
        // bounded grain: one row per source (bounded source set)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))).cast("long"))
        .withColumn("bonus",
          when(col("rk") <= lit(100L) - col("sb"), 1L).otherwise(0L))
      ranked.select(col("source"), col("nd").as("n_docs"),
          (col("base") + col("bonus")).as("slots"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(
    // identical ×20-cleared interpolation
    "q_lead_time" ->
      """WITH j AS (
        |  SELECT o.o_orderpriority,
        |    CAST(datediff('day', o.o_orderdate, l.l_shipdate)
        |      AS BIGINT) AS lead
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |rk AS (
        |  SELECT o_orderpriority, lead,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY lead) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority)
        |      AS BIGINT) AS n
        |  FROM j),
        |ag AS (
        |  SELECT o_orderpriority, MAX(n) AS n_lines,
        |    CAST(SUM(lead) AS BIGINT) AS sl,
        |    SUM(CASE WHEN rn = ((n - 1) * 10) // 20 + 1 THEN lead
        |        ELSE 0 END) * (20 - MAX(((n - 1) * 10) % 20))
        |      + SUM(CASE WHEN rn = ((n - 1) * 10) // 20 + 2 THEN lead
        |        ELSE 0 END) * MAX(((n - 1) * 10) % 20) AS v50,
        |    SUM(CASE WHEN rn = ((n - 1) * 18) // 20 + 1 THEN lead
        |        ELSE 0 END) * (20 - MAX(((n - 1) * 18) % 20))
        |      + SUM(CASE WHEN rn = ((n - 1) * 18) // 20 + 2 THEN lead
        |        ELSE 0 END) * MAX(((n - 1) * 18) % 20) AS v90
        |  FROM rk GROUP BY 1)
        |SELECT o_orderpriority, n_lines,
        |  ROUND(v50 / 20.0, 2) AS p50_days,
        |  ROUND(v90 / 20.0, 2) AS p90_days,
        |  ROUND(CAST(sl AS DOUBLE) / n_lines, 4) AS mean_days
        |FROM ag ORDER BY o_orderpriority""".stripMargin,

    // identical half split, terciles and matrix shares
    "q_segment_migration" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderdate < DATE '1996-01-01' THEN 'h1'
        |      ELSE 'h2' END AS half,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |sg AS (
        |  SELECT o_custkey, half,
        |    ntile(3) OVER (PARTITION BY half ORDER BY n, o_custkey)
        |      AS seg
        |  FROM o),
        |m AS (
        |  SELECT a.seg AS seg_h1, b.seg AS seg_h2,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM sg a JOIN sg b ON a.o_custkey = b.o_custkey
        |    AND a.half = 'h1' AND b.half = 'h2'
        |  GROUP BY 1, 2),
        |rt AS (SELECT seg_h1, CAST(SUM(n) AS BIGINT) AS row_n
        |       FROM m GROUP BY 1)
        |SELECT CAST(m.seg_h1 AS BIGINT) AS seg_h1,
        |  CAST(m.seg_h2 AS BIGINT) AS seg_h2, m.n,
        |  ROUND(CAST(m.n AS DOUBLE) / rt.row_n, 4) AS share
        |FROM m JOIN rt ON m.seg_h1 = rt.seg_h1
        |ORDER BY seg_h1, seg_h2""".stripMargin,

    // identical synthesized columns, date compare and exact slack
    "q_fill_rate" ->
      """WITH syn AS (
        |  SELECT
        |    ['AIR', 'MAIL', 'RAIL', 'SHIP', 'TRUCK']
        |      [CAST((l_orderkey + l_linenumber) % 5 + 1 AS INT)]
        |      AS l_shipmode,
        |    CAST(l_shipdate AS DATE) + CAST(l_orderkey % 10 + 5 AS INT)
        |      AS l_commitdate,
        |    CAST(l_shipdate AS DATE)
        |      + CAST((l_orderkey + l_linenumber) % 14 + 1 AS INT)
        |      AS l_receiptdate
        |  FROM lineitem),
        |t AS (
        |  SELECT l_shipmode,
        |    CASE WHEN l_receiptdate <= l_commitdate THEN 1 ELSE 0 END
        |      AS ontime,
        |    CAST(datediff('day', l_receiptdate, l_commitdate)
        |      AS BIGINT) AS slack
        |  FROM syn)
        |SELECT l_shipmode, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(ontime) AS BIGINT) AS n_ontime,
        |  ROUND(CAST(SUM(ontime) AS DOUBLE) / COUNT(*), 6)
        |    AS fill_rate,
        |  ROUND(CAST(SUM(slack) AS DOUBLE) / COUNT(*), 4)
        |    AS avg_slack_days
        |FROM t GROUP BY 1 ORDER BY l_shipmode""".stripMargin,

    // identical centi-% bands and 1e-4-dollar net
    "q_discount_bands" ->
      """WITH t AS (
        |  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS band,
        |    l_quantity,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
        |      AS net_u
        |  FROM lineitem)
        |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  ROUND(CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*), 4)
        |    AS avg_qty,
        |  ROUND(CAST(SUM(net_u) AS BIGINT) / 1e4 / 100, 2)
        |    AS net_revenue
        |FROM t GROUP BY 1 ORDER BY band""".stripMargin,

    // identical anti join and shares
    "q_never_ordered" ->
      """WITH nv AS (
        |  SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_never
        |  FROM part p
        |  WHERE p.p_partkey NOT IN
        |    (SELECT DISTINCT l_partkey FROM lineitem)
        |  GROUP BY 1),
        |tt AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1)
        |SELECT tt.p_brand, tt.n_parts,
        |  COALESCE(nv.n_never, 0) AS n_never,
        |  ROUND(CAST(COALESCE(nv.n_never, 0) AS DOUBLE) / tt.n_parts,
        |    4) AS share_never
        |FROM tt LEFT JOIN nv ON tt.p_brand = nv.p_brand
        |ORDER BY tt.p_brand""".stripMargin,

    // identical Hare quotas and tie-break
    "q_largest_remainder" ->
      """WITH src AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM documents GROUP BY 1),
        |tt AS (SELECT CAST(SUM(nd) AS BIGINT) AS nn FROM src),
        |quo AS (
        |  SELECT source, nd,
        |    (nd * 100) // tt.nn AS base, (nd * 100) % tt.nn AS rem
        |  FROM src, tt),
        |sb AS (SELECT CAST(SUM(base) AS BIGINT) AS sb FROM quo),
        |rk AS (
        |  SELECT quo.*, sb.sb,
        |    CAST(row_number() OVER (ORDER BY rem DESC, source)
        |      AS BIGINT) AS rk
        |  FROM quo, sb)
        |SELECT source, nd AS n_docs,
        |  CAST(base + CASE WHEN rk <= 100 - sb THEN 1 ELSE 0 END
        |    AS BIGINT) AS slots
        |FROM rk ORDER BY source""".stripMargin
  )
}
